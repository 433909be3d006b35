"""Single-node numerical kernels shared by the Arrow UDFs and the NumPy oracle.

These implement, bit-for-bit, the public specs the reference relies on:

* text normalization — reference ``_normalize_text``
  (/root/reference/text/method/pipeline_api.py:218-226) and the delete-variant
  (/root/reference/text/method/jaccard_deduplication.py:11-17);
* multi-granularity n-grams — ``_compute_ngrams`` (pipeline_api.py:229-242);
* LSH char-grams / word tokens — ``_char_ngrams`` (pipeline_api.py:245-249)
  and the ``max_words`` slice (pipeline_api.py:426-428);
* MinHash — the datasketch library's public hash spec (sha1 low-32-bit feature
  hash; affine permutations mod the Mersenne prime 2^61-1 drawn from
  ``np.random.RandomState(seed=1)`` in (a, b) call order; running minimum
  masked to 32 bits). Reference usage: pipeline_api.py:417-431.
* SimHash — the ``simhash`` PyPI library's public spec (lowercase, concat of
  ``[\\w\\u4e00-\\u9fff]+`` matches, width-4 character slide, md5 low-64-bit
  token hash, weighted bit votes, bit set iff vote > 0). Reference usage:
  pipeline_api.py:373-414.

Keeping one shared kernel guarantees the Spark pipeline and the oracle agree
on per-document features exactly; the tests then exercise the *distributed
decomposition* (banding, pair-gen, salting, connected components), which is
where a rebuild can actually diverge from the reference.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Iterable, List, Sequence, Set

import numpy as np

# ---------------------------------------------------------------------------
# normalization (P1)
# ---------------------------------------------------------------------------

_NON_ALNUM_RE = re.compile(r"[^\w\s一-鿿]", re.UNICODE)
_WHITESPACE_RE = re.compile(r"\s+", re.UNICODE)


def normalize_text(
    content: str,
    lowercase: bool = True,
    strip_non_alnum: bool = True,
    collapse_whitespace: bool = True,
    strip_mode: str = "space",
) -> str:
    """Reference pipeline_api.py:218-226 (strip_mode="space") or
    jaccard_deduplication.py:11-17 (strip_mode="delete")."""
    text = content
    if lowercase:
        text = text.lower()
    if strip_non_alnum:
        text = _NON_ALNUM_RE.sub(" " if strip_mode == "space" else "", text)
    if collapse_whitespace:
        text = _WHITESPACE_RE.sub(" ", text)
    return text.strip()


# ---------------------------------------------------------------------------
# n-gram features (P2-P6)
# ---------------------------------------------------------------------------


def multigranularity_ngrams(text: str, n: int) -> Set[str]:
    """char n-grams (spaces included) ∪ word n-grams; whole text if shorter
    than n. Reference pipeline_api.py:229-242."""
    if not text:
        return set()
    length = len(text)
    if length < n:
        char_ngrams = {text}
    else:
        char_ngrams = {text[i : i + n] for i in range(length - n + 1)}
    words = text.split()
    word_ngrams: Set[str] = set()
    if len(words) >= n:
        for idx in range(len(words) - n + 1):
            word_ngrams.add(" ".join(words[idx : idx + n]))
    return char_ngrams | word_ngrams


def lsh_char_grams(text: str, n: int, max_char_grams: int) -> List[str]:
    """Spaces removed first; ordered list (not set) capped at max_char_grams.
    Reference pipeline_api.py:245-249 + cap at :429-430."""
    cleaned = text.replace(" ", "")
    if len(cleaned) < n:
        grams = [] if not cleaned else [cleaned]
    else:
        grams = [cleaned[i : i + n] for i in range(len(cleaned) - n + 1)]
    return grams[:max_char_grams]


def lsh_word_tokens(text: str, max_words: int) -> List[str]:
    """First max_words whitespace tokens. Reference pipeline_api.py:426-428."""
    return text.split()[:max_words]


def hash_feature_u64(feature: str) -> int:
    """Deterministic 64-bit id for a shingle: first 8 bytes of sha1,
    little-endian. Used to carry shingle SETS as array<long> columns so that
    Jaccard verification stays JVM-side (array_intersect/array_union) instead
    of shipping strings through the shuffle."""
    return struct.unpack("<Q", hashlib.sha1(feature.encode("utf-8")).digest()[:8])[0]


def hash_features_u64(features: Iterable[str]) -> np.ndarray:
    return np.fromiter(
        (hash_feature_u64(f) for f in features), dtype=np.uint64
    )


# ---------------------------------------------------------------------------
# MinHash (J5) — datasketch public spec
# ---------------------------------------------------------------------------

_MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)


def sha1_hash32(data: bytes) -> int:
    """datasketch's default feature hash: low 32 bits of sha1 (LE)."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def minhash_permutations(num_perm: int, seed: int = 1) -> np.ndarray:
    """(2, num_perm) uint64 (a, b) pairs, drawn in datasketch's exact call
    order from RandomState(seed) so signatures match the library bit-for-bit."""
    gen = np.random.RandomState(seed)
    perms = np.array(
        [
            (
                gen.randint(1, _MERSENNE_PRIME, dtype=np.uint64),
                gen.randint(0, _MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    return perms


def minhash_from_hashvalues(
    hv: np.ndarray, permutations: np.ndarray
) -> np.ndarray:
    """uint64[num_perm] signature from precomputed 32-bit feature hashes —
    lets callers that already hold the sha1 digests (the fused feature UDF
    shares one digest between the 32-bit MinHash hash and the 64-bit shingle
    id) skip re-hashing. Empty input → all _MAX_HASH (datasketch's initial
    hashvalues)."""
    a, b = permutations
    num_perm = a.shape[0]
    if hv.size == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    # same uint64 wraparound semantics as the numpy expression in datasketch
    phv = np.bitwise_and(
        (hv[:, None] * a[None, :] + b[None, :]) % _MERSENNE_PRIME, _MAX_HASH
    )
    return phv.min(axis=0)


def minhash_signature(
    feature_bytes: Sequence[bytes], permutations: np.ndarray
) -> np.ndarray:
    """uint64[num_perm] signature. Empty feature list → all _MAX_HASH
    (datasketch's initial hashvalues)."""
    if not feature_bytes:
        return np.full(permutations.shape[1], _MAX_HASH, dtype=np.uint64)
    hv = np.fromiter(
        (sha1_hash32(f) for f in feature_bytes), dtype=np.uint64,
        count=len(feature_bytes),
    )
    return minhash_from_hashvalues(hv, permutations)


def fast_feature_hashes32(
    norm: str,
    ngram: int,
    max_words: int,
    max_char_grams: int,
    include_words: bool = True,
) -> np.ndarray:
    """Vectorized 32-bit feature hashes for ``hash_family="kr32"`` — the
    same feature definition as the sha1/datasketch path (first ``max_words``
    whitespace tokens + first ``max_char_grams`` space-stripped char
    n-grams of the normalized text), but hashed with the Karp-Rabin rolling
    kernel (char-grams: ONE vectorized pass, no per-gram string slicing)
    and zlib.crc32 (word tokens: C speed) instead of one Python sha1 per
    feature. NOT datasketch-bit-parity, and the two sub-domains are hashed
    separately: a string that is simultaneously a word token and a char
    gram counts once per domain here, where the sha1 path merges it — a
    Jaccard-neutral difference (the double-count lands symmetrically in
    intersection and union), pinned with the recall-parity bounds in
    tests/test_e2e_recall.py::TestFastHashFamily. Returns uint64 values in
    the 32-bit domain (datasketch's feature-hash domain)."""
    import zlib

    parts = []
    if include_words:
        toks = norm.split()[:max_words]
        if toks:
            parts.append(
                np.fromiter(
                    (zlib.crc32(t.encode("utf-8")) for t in toks),
                    dtype=np.uint64,
                    count=len(toks),
                )
            )
    cleaned = norm.replace(" ", "")
    if cleaned:
        if len(cleaned) < ngram:
            parts.append(
                np.array([zlib.crc32(cleaned.encode("utf-8"))], dtype=np.uint64)
            )
        else:
            h = rolling_kgram_hashes(cleaned, ngram)[:max_char_grams]
            parts.append(h >> np.uint64(32))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.count_nonzero(sig_a == sig_b)) / float(sig_a.shape[0])


# ---------------------------------------------------------------------------
# MinHash-LSH (b, r) selection — datasketch _optimal_param, public math
# ---------------------------------------------------------------------------


def _integrate(f, a: float, b: float, steps: int = 2000) -> float:
    xs = np.linspace(a, b, steps)
    trapz = getattr(np, "trapezoid", None) or np.trapz
    return float(trapz(f(xs), xs))


def optimal_band_param(
    threshold: float,
    num_perm: int,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> tuple:
    """Pick (b, r) with b*r <= num_perm minimizing weighted FP/FN area under
    the S-curve P(s) = 1 - (1 - s^r)^b — the same objective datasketch's
    MinHashLSH uses (numerical integration; grid fine enough that the integer
    argmin is stable)."""
    best = None
    best_err = float("inf")
    for b in range(1, num_perm + 1):
        max_r = num_perm // b
        for r in range(1, max_r + 1):
            fp = _integrate(lambda s: 1.0 - (1.0 - s ** float(r)) ** float(b), 0.0, threshold)
            fn = _integrate(
                lambda s: 1.0 - (1.0 - (1.0 - s ** float(r)) ** float(b)),
                threshold,
                1.0,
            )
            err = fp * false_positive_weight + fn * false_negative_weight
            if err < best_err:
                best_err = err
                best = (b, r)
    return best


def lsh_param_search(signature_length: int, threshold: float) -> tuple:
    """The reference's simpler rule: choose b*r = signature_length minimizing
    |(1/b)^(1/r) - threshold| (audio/method/audio_dedup_main.py:35-62)."""
    best = None
    best_err = float("inf")
    for b in range(1, signature_length + 1):
        if signature_length % b != 0:
            continue
        r = signature_length // b
        err = abs((1.0 / b) ** (1.0 / r) - threshold)
        if err < best_err:
            best_err = err
            best = (b, r)
    return best


def s_curve(s: np.ndarray, b: int, r: int) -> np.ndarray:
    """P(candidate | similarity s) = 1 - (1 - s^r)^b — reference's sanity
    check (audio/method/LSH_deal_with_photo.py:24-45)."""
    return 1.0 - (1.0 - np.asarray(s, dtype=np.float64) ** float(r)) ** float(b)


# ---------------------------------------------------------------------------
# SimHash (J4) — `simhash` PyPI library public spec
# ---------------------------------------------------------------------------

_SIMHASH_TOKEN_RE = re.compile(r"[\w一-鿿]+", re.UNICODE)
_SIMHASH_F = 64
_SIMHASH_WIDTH = 4


def simhash_tokens(content: str, width: int = _SIMHASH_WIDTH) -> List[str]:
    """The library's _tokenize + _slide: lowercase, concat [\\w一-鿿]+ matches,
    width-4 slide. Always returns >= 1 token ('' for empty content), matching
    `range(max(len - width + 1, 1))`."""
    content = content.lower()
    content = "".join(_SIMHASH_TOKEN_RE.findall(content))
    return [content[i : i + width] for i in range(max(len(content) - width + 1, 1))]


def _simhash_from_token_hashes(hv: np.ndarray, n_tokens: int) -> int:
    """Per-bit majority vote → 64-bit fingerprint (the simhash-library
    tail, shared by the plain and token-cached entry points)."""
    # unpack to (n_tokens, 64) bit matrix; bit i == (h >> i) & 1
    bits = np.unpackbits(hv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = 2 * bits.astype(np.int64).sum(axis=0) - n_tokens
    out = np.uint64(0)
    for i in range(_SIMHASH_F):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def _md5_low64(token: str) -> int:
    # low 64 bits of int(md5.hexdigest(), 16) == last 8 digest bytes, BE
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:], "big")


def simhash64(content: str) -> int:
    """64-bit SimHash of a string, matching Simhash(content) from the
    `simhash` library (md5 token hash, low 64 bits; vote > 0 sets the bit)."""
    tokens = simhash_tokens(content)
    hv = np.fromiter(
        (_md5_low64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    return _simhash_from_token_hashes(hv, len(tokens))


def simhash64_cached(content: str, token_cache: dict) -> int:
    """simhash64 with a caller-owned token→hash memo: the width-4 slide
    vocabulary repeats heavily across a batch's documents, so one md5 per
    DISTINCT token (dict hit otherwise) replaces one md5 per occurrence —
    the fused featurization UDF passes a per-batch cache, mirroring its
    sha1 digest cache. Bit-identical to :func:`simhash64` (pinned by
    tests/test_kernels.py)."""
    tokens = simhash_tokens(content)
    hv = np.empty(len(tokens), dtype=np.uint64)
    get = token_cache.get
    for k, t in enumerate(tokens):
        h = get(t)
        if h is None:
            if len(token_cache) >= 1_000_000:
                token_cache.clear()
            h = _md5_low64(t)
            token_cache[t] = h
        hv[k] = h
    return _simhash_from_token_hashes(hv, len(tokens))


def hamming_distance64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_band_layout(f: int = 64, dist: int = 10) -> List[tuple]:
    """(offset, width) for dist+1 blocks covering f bits. Pigeonhole: two
    fingerprints within Hamming distance <= dist agree exactly on at least one
    block."""
    nblocks = dist + 1
    base = f // nblocks
    rem = f % nblocks
    layout = []
    off = 0
    for i in range(nblocks):
        w = base + (1 if i < rem else 0)
        layout.append((off, w))
        off += w
    return layout


# ---------------------------------------------------------------------------
# exact-substring detection kernels (J17 scale path)
# ---------------------------------------------------------------------------


_KR_BASE = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd → invertible mod 2^64
_KR_BASE_INV = np.uint64(pow(int(_KR_BASE), -1, 1 << 64))
# independent second base for the 128-bit L-gram key (xorshift* multiplier)
_KR_BASE2 = np.uint64(0x2545F4914F6CDD1D | 1)
_KR_BASE2_INV = np.uint64(pow(int(_KR_BASE2), -1, 1 << 64))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain spec) — decorrelates
    the algebraic Karp-Rabin values before min-selection."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def rolling_kgram_hashes(
    text: str,
    kgram: int,
    base: np.uint64 = _KR_BASE,
    base_inv: np.uint64 = _KR_BASE_INV,
) -> np.ndarray:
    """All k-gram hashes of `text`, vectorized: Karp-Rabin over the exact
    ring Z/2^64 (position factored out via modular inverse powers), then a
    splitmix64 finalizer. ~20x faster than per-substring sha1 — this is the
    hot kernel of the winnowing substring detector."""
    n = len(text)
    m = n - kgram + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.uint64)
        inv_pows = np.cumprod(
            np.concatenate(([np.uint64(1)], np.full(n - 1, base_inv))),
            dtype=np.uint64,
        )
        pows = np.cumprod(
            np.concatenate(([np.uint64(1)], np.full(m - 1, base))),
            dtype=np.uint64,
        )
        q = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(codes * inv_pows, out=q[1:], dtype=np.uint64)
        # H[i] = (Q[i+k] - Q[i]) * B^i  — position-independent k-gram hash
        h = (q[kgram : kgram + m] - q[:m]) * pows
        return _splitmix64(h)


def lgram_hashes128(text: str, lgram: int) -> tuple:
    """(h1, h2) uint64 arrays — the distinct L-gram 128-bit rolling-hash
    keys of `text` (two independent Karp-Rabin bases, deduplicated as
    pairs). 128 bits keeps the spurious-bucket birthday bound negligible at
    corpus scale (~10^14 positions → ~2^93 headroom), where a single 64-bit
    key would manufacture ~10^8 false pairs."""
    h1 = rolling_kgram_hashes(text, lgram)
    if h1.size == 0:
        return h1, h1
    h2 = rolling_kgram_hashes(text, lgram, _KR_BASE2, _KR_BASE2_INV)
    both = np.unique(np.stack([h1, h2], axis=1), axis=0)
    return both[:, 0], both[:, 1]


def lgram_hashes128_prev(text: str, lgram: int) -> tuple:
    """(h1, h2, prev, has_prev) — like :func:`lgram_hashes128` (first-
    occurrence-deduplicated 128-bit L-gram keys) plus, per kept gram, a
    64-bit mix of the key of the L-gram starting ONE character earlier
    (``has_prev=False`` when the kept occurrence is position 0).

    Feeds the left-extension pair suppression in operators/suffix_array.py:
    inside an L-gram bucket, two docs with equal ``prev`` provably share the
    preceding L-gram as well, so their pair re-appears in that earlier
    bucket — emitting pairs only ACROSS distinct prev groups removes the
    ~(span−L) duplicate assertions a shared span of length span produces,
    while the leftmost-divergence induction (suffix_array.py docstring)
    keeps every true pair emitted at least once."""
    h1 = rolling_kgram_hashes(text, lgram)
    if h1.size == 0:
        return h1, h1, h1, np.empty(0, dtype=bool)
    h2 = rolling_kgram_hashes(text, lgram, _KR_BASE2, _KR_BASE2_INV)
    with np.errstate(over="ignore"):
        # 64-bit wrap mix of the 128-bit key. A cross-doc false prev
        # equality (~2^-64 per in-bucket pair) suppresses that bucket's
        # assertion of the pair; a pair sharing SEVERAL buckets survives
        # through the others, but a pair whose docs share exactly ONE
        # L-gram bucket would be lost entirely — within the same
        # negligible-collision risk budget as the 2^-93 key-collision
        # bound documented for the 128-bit bucket keys themselves
        mix = h1 * _KR_BASE2 + h2
    prev = np.empty_like(mix)
    prev[1:] = mix[:-1]
    prev[0] = 0
    has_prev = np.ones(h1.shape[0], dtype=bool)
    has_prev[0] = False
    # np.unique(return_index) keeps the FIRST occurrence per key — required
    # by the suppression proof (prev must belong to the earliest occurrence)
    _, idx = np.unique(np.stack([h1, h2], axis=1), axis=0, return_index=True)
    return h1[idx], h2[idx], prev[idx], has_prev[idx]


def sliding_min(values: np.ndarray, window: int) -> np.ndarray:
    """Minimum over every length-`window` sliding window, O(m) vectorized
    (two-block prefix/suffix minima — the van Herk/Gil-Werman scheme)."""
    m = values.shape[0] - window + 1
    if m <= 0:
        return np.array([values.min()]) if values.size else values[:0]
    n = values.shape[0]
    pad = (-n) % window
    padded = np.concatenate([values, np.full(pad, np.iinfo(np.uint64).max,
                                             dtype=np.uint64)])
    blocks = padded.reshape(-1, window)
    pre = np.minimum.accumulate(blocks, axis=1).ravel()[:n]
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()[:n]
    return np.minimum(suf[:m], pre[window - 1 : window - 1 + m])


def winnow_fingerprints(text: str, kgram: int, window: int) -> List[tuple]:
    """Winnowing (Schleimer et al. 2003): keep the minimal hash of every
    window of `window` consecutive kgram hashes. Guarantees any common
    substring of length >= kgram + window - 1 shares a fingerprint (the
    guarantee is on hash VALUES — tie position is irrelevant because
    fingerprints are deduplicated by value downstream).
    Returns [(hash, first_window_index)] deduplicated by hash."""
    n = len(text)
    if n < kgram:
        return []
    hashes = rolling_kgram_hashes(text, kgram)
    mins = sliding_min(hashes, window)
    vals, idx = np.unique(mins, return_index=True)
    return [(int(v), int(i)) for v, i in zip(vals, idx)]


def longest_common_substring_len(a: str, b: str) -> int:
    """O(len(a)*len(b)) DP — oracle-side verification only (small inputs)."""
    if not a or not b:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    best = 0
    for i in range(1, len(a) + 1):
        cur = np.zeros(len(b) + 1, dtype=np.int32)
        ca = a[i - 1]
        for j in range(1, len(b) + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = int(cur[j])
        prev = cur
    return best
