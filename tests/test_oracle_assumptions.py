"""Preconditions the DuckDB oracle conversions rely on, asserted explicitly
so a driver-testdata change produces a CLEAR failure here instead of an
opaque value-hash mismatch in CORRECTNESS_r{N}:

* sorter_categories assumes the documents corpus is pure-ASCII printable
  prose (printable ratio >= 0.85, no JSON-parsable text, no magic-prefix
  hits) — the SQL printable-ratio expression is ASCII-scoped;
* semdedup_decisions / ann_topk_bruteforce / embedding_dup_edges assume a
  unit-norm embedding corpus (raw float64 dot == cosine) and comfortable
  float margins at their thresholds (cross-engine summation-order noise is
  ~1e-15; margins must dwarf it);
* ngram_jaccard_edges assumes no pair sits exactly at the 0.8 boundary
  region closer than the documented gap.

Driver-scale only needs sf0.01 (the gate's SF); sf0.001 rides along free.
"""

import json

import numpy as np
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _docs(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).df()


def _emb(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).df()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_are_ascii_printable_non_json(sf_dir):
    # the engine's OWN printable definition (sorter.py), not a local copy —
    # if the sorter's LUT or threshold changes, this precondition test must
    # track it automatically
    from deduplication_framework_spark.functions.sorter import (
        is_mostly_printable,
    )

    d = _docs(sf_dir)
    for t in d.text:
        b = t.encode("utf-8")[:4096]
        assert all(c < 128 for c in b), "non-ASCII doc breaks the sorter oracle"
        assert is_mostly_printable(b), "non-printable doc flips a sorter branch"
        s = t.lstrip()
        assert not s.startswith(("{", "[")), "JSON-shaped doc hits magic sniff"
        try:
            json.loads(t)
            raise AssertionError("JSON-parsable doc changes .json branch")
        except (json.JSONDecodeError, ValueError):
            pass
        head = t[:4096]
        for magic in ("GIF87a", "GIF89a", "ID3", "fLaC"):
            assert not t.startswith(magic)
        assert not (t[:4] == "RIFF" and t[8:12] == "WAVE")
        assert "metadata:image" not in head and "<svg" not in head.lower()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_unit_norm_and_margins(sf_dir):
    e = _emb(sf_dir)
    M = np.stack(e.embedding.to_numpy()).astype(np.float64)
    labels = e.label.to_numpy()
    norms = np.linalg.norm(M, axis=1)
    assert np.abs(norms - 1.0).max() < 1e-5, "raw dot != cosine"

    # semdedup: nearest within-label max-prior sim to the 1-0.7 threshold
    margins = []
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        if len(idx) < 2:
            continue
        S = M[idx] @ M[idx].T
        mp = np.max(np.triu(S, k=1)[:, 1:], axis=0)
        margins.extend(np.abs(mp - (1.0 - 0.7)))
    assert min(margins) > 1e-9, "semdedup keep decision within float noise"

    # ann top-k: adjacent top-6 dot gaps (exact ties allowed — both engines
    # break them by id; only NEAR-ties inside float noise are dangerous)
    S = M @ M.T
    np.fill_diagonal(S, -np.inf)
    Ss = np.sort(S, axis=1)[:, ::-1]
    gaps = Ss[:, :6] - Ss[:, 1:7]
    nz = gaps[gaps > 0]
    assert nz.min() > 1e-9, "ann rank boundary within float noise"

    # embedding_dup_edges: nearest dot to the 0.3 threshold
    iu = np.triu_indices(len(M), k=1)
    assert np.abs(S[iu] - 0.3).min() > 1e-9
