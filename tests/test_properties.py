"""Property-based tests (SURVEY.md §5.2 item 4, hypothesis): perturbation
bounds and estimator accuracy — pure kernels, no Spark."""

import numpy as np
from hypothesis import given, settings, strategies as st

from deduplication_framework_spark.functions import kernels as K

WORDS = [f"w{i}" for i in range(500)]


@st.composite
def token_doc(draw):
    n = draw(st.integers(min_value=30, max_value=120))
    idxs = draw(st.lists(st.integers(0, len(WORDS) - 1), min_size=n, max_size=n))
    return [WORDS[i] for i in idxs]


@given(token_doc(), st.integers(0, 5), st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_small_edits_bound_jaccard(tokens, k, rnd):
    """Substituting k tokens cannot drop multi-granularity 3-gram Jaccard
    below a crude-but-provable floor: each token substitution perturbs a
    bounded neighborhood of char- and word-grams."""
    text_a = " ".join(tokens)
    toks_b = list(tokens)
    for _ in range(min(k, len(toks_b))):
        j = rnd.randrange(len(toks_b))
        toks_b[j] = WORDS[rnd.randrange(len(WORDS))]
    text_b = " ".join(toks_b)

    a = K.multigranularity_ngrams(K.normalize_text(text_a), 3)
    b = K.multigranularity_ngrams(K.normalize_text(text_b), 3)
    union = a | b
    j_sim = len(a & b) / len(union) if union else 1.0
    if k == 0:
        assert j_sim == 1.0
    else:
        # each substituted token of length L touches <= L+2 char-grams and
        # <= 3 word-grams on each side; with ~500 grams per doc, 5 edits
        # cannot push J below ~0.5
        assert j_sim > 0.35


@given(st.integers(10, 200), st.integers(0, 200), st.integers(1, 1000))
@settings(max_examples=20, deadline=None)
def test_minhash_estimate_tracks_true_jaccard(n_shared, n_only, seed):
    rng = np.random.RandomState(seed)
    a = [f"s{i}".encode() for i in range(n_shared + n_only)]
    b = [f"s{i}".encode() for i in range(n_shared)] + [
        f"t{i}".encode() for i in range(n_only)
    ]
    true_j = n_shared / (n_shared + 2 * n_only)
    perms = K.minhash_permutations(128)
    est = K.minhash_jaccard_estimate(
        K.minhash_signature(a, perms), K.minhash_signature(b, perms)
    )
    sigma = max((true_j * (1 - true_j) / 128) ** 0.5, 1e-6)
    assert abs(est - true_j) <= 5 * sigma + 0.02


@given(st.text(alphabet="abcdef ", min_size=0, max_size=400))
@settings(max_examples=50, deadline=None)
def test_simhash_self_distance_zero(s):
    fp = K.simhash64(s)
    assert K.hamming_distance64(fp, fp) == 0
    assert 0 <= fp < (1 << 64)


@given(
    st.text(alphabet="abcd", min_size=60, max_size=200),
    st.text(alphabet="wxyz", min_size=30, max_size=100),
    st.text(alphabet="wxyz", min_size=30, max_size=100),
)
@settings(max_examples=25, deadline=None)
def test_winnow_guarantee_property(common, pre, post):
    """Docs sharing `common` (len >= k+w-1) always share a fingerprint."""
    k, w = 20, 41  # guarantee threshold k+w-1 = 60 <= len(common)
    a, b = pre + common, common + post
    fa = {h for h, _ in K.winnow_fingerprints(a, k, w)}
    fb = {h for h, _ in K.winnow_fingerprints(b, k, w)}
    assert fa & fb


@given(
    st.integers(0, (1 << 64) - 1),
    st.lists(st.integers(0, 63), min_size=0, max_size=10, unique=True),
)
@settings(max_examples=300, deadline=None)
def test_recursive_pigeonhole_property(fp_a, flip_bits):
    """The lossless-hot-bucket argument in simhash_candidate_edges, as
    pure bit math: for ANY pair within hamming <= dist, (a) some block
    agrees exactly (classic pigeonhole), and (b) for EVERY agreeing
    block, the complement bits — where all <= dist differences live —
    split into dist+1 sub-blocks of which at least one agrees (the same
    pigeonhole, one level down). (b) is what makes the sub-bucket join
    exact for pairs whose only agreeing block is hot."""
    dist = 10
    fp_b = fp_a
    for bit in flip_bits:
        fp_b ^= 1 << bit

    layout = K.simhash_band_layout(64, dist)
    agreeing = []
    for off, w in layout:
        mask = ((1 << w) - 1) << off
        if (fp_a & mask) == (fp_b & mask):
            agreeing.append((off, w))
    assert agreeing, "pigeonhole level 1 violated"

    def complement(fp, off, w):
        low = fp & ((1 << off) - 1)
        high = (fp >> (off + w)) << off if off + w < 64 else 0
        return low | high

    for off, w in agreeing:
        ca = complement(fp_a, off, w)
        cb = complement(fp_b, off, w)
        sub = K.simhash_band_layout(64 - w, dist)
        assert any(
            ((ca >> so) & ((1 << sw) - 1)) == ((cb >> so) & ((1 << sw) - 1))
            for so, sw in sub
        ), "pigeonhole level 2 violated"
