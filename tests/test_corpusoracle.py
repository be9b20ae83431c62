"""Offline (no-Ray) parity tests: the DuckDB oracle SQL in
osmnetfusion_ray/corpusoracle.py must reproduce the engine's fingerprint /
dedup kernels bit-for-bit on a small synthetic document table — the same
contract the driver's correctness gate checks at sf0.01.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmnetfusion_ray import corpusoracle as co
from osmnetfusion_ray.functions import hashing


def _docs() -> pa.Table:
    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = []
    for i in range(40):
        n = int(rng.randint(1, 60))
        words = [vocab[int(rng.randint(len(vocab)))] for _ in range(n)]
        texts.append(" ".join(words))
    texts += [texts[0], texts[1] + " extra", "", "x"]  # dups + edge cases
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("documents", _docs())
    return c


def _cmp(eng: pd.DataFrame, ora: pd.DataFrame):
    cols = sorted(eng.columns)
    assert cols == sorted(ora.columns)
    eng = eng[cols].sort_values(cols).reset_index(drop=True)
    ora = ora[cols].sort_values(cols).reset_index(drop=True)
    assert len(eng) == len(ora)
    for c in cols:
        a, b = eng[c].to_numpy(), ora[c].to_numpy()
        if a.dtype.kind == "f" or np.asarray(b).dtype.kind == "f":
            assert np.array_equal(a.astype(np.float64), np.asarray(b, dtype=np.float64)), c
        else:
            assert (pd.Series(a).astype(object) == pd.Series(b).astype(object)).all(), c


def test_fnv1a64_matches_sql(con):
    words = ["hello", "a", "", "key agg row scan", "Ümlaut", "x" * 200]
    eng = hashing.fnv1a64(np.asarray(words, dtype=object))
    got = [
        int(con.execute(
            f"SELECT CAST({co.fnv_expr('t')} AS UBIGINT) FROM (SELECT ? AS t)", [w]
        ).fetchone()[0])
        for w in words
    ]
    assert [int(v) for v in eng] == got


def test_fnv1a64_reference_loop():
    def ref(s: str) -> int:
        h = 14695981039346656037
        for c in s:
            h = ((h ^ ord(c)) * 1099511628211) % (1 << 64)
        return h

    words = ["", "a", "hello world", "x" * 553]
    out = hashing.fnv1a64(np.asarray(words, dtype=object))
    assert [int(v) for v in out] == [ref(w) for w in words]


def test_simhash_oracle(con):
    from osmnetfusion_ray.pipelines.corpus import simhash_batch

    _cmp(simhash_batch(_docs()).to_pandas(), con.execute(co.simhash_sql()).df())


def test_fingerprints_oracle(con):
    from osmnetfusion_ray.pipelines.corpus import rolling_fingerprint_batch

    _cmp(rolling_fingerprint_batch(_docs()).to_pandas(),
         con.execute(co.fingerprints_sql()).df())


def test_media_pipeline_oracle(con):
    from osmnetfusion_ray.stages import multimodal as MM

    m = MM.media_from_documents_batch(_docs())
    m = MM.MediaDecoder()(m)
    m = MM.MediaResizer()(m)
    eng = m.select(["media_id", "media_type", "media_bytes", "width", "height",
                    "n_frames", "duration_s", "resized_w", "resized_h"]).to_pandas()
    _cmp(eng, con.execute(co.media_pipeline_sql()).df())


def test_minhash_candidates_and_est_oracle(con):
    """Engine MinHasher (signatures + band hashes + bucket pairs + est) vs
    the SQL candidate CTE — run driver-free on the same table."""
    from osmnetfusion_ray.pipelines.corpus import MinHasher

    t = _docs()
    texts = t["text"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy()
    mh = MinHasher(64, 16)
    sigs = mh.signatures(texts)
    n = len(texts)
    br = sigs.reshape(n, 16, 4)
    with np.errstate(over="ignore"):
        bh = br.astype(np.uint64).sum(axis=2) * np.uint64(0x9E3779B97F4A7C15)
        for r in range(4):
            bh ^= br[:, :, r] * np.uint64(0xC2B2AE3D27D4EB4F + r)
    from collections import defaultdict

    bu = defaultdict(list)
    for i in range(n):
        for b in range(16):
            bu[(b, int(bh[i, b]))].append(int(ids[i]))
    pairs = set()
    for _, v in bu.items():
        if 2 <= len(v) <= 1000:
            v = sorted(v)
            for x in range(len(v)):
                for y in range(x + 1, len(v)):
                    pairs.add((v[x], v[y]))
    id2row = {int(d): i for i, d in enumerate(ids)}
    rows = []
    for a, b in sorted(pairs):
        est = float((sigs[id2row[a]] == sigs[id2row[b]]).mean())
        if est >= 0.6:
            rows.append((a, b, est))
    eng = pd.DataFrame(rows, columns=["a", "b", "jaccard_est"])
    ora = con.execute(co.minhash_near_dups_sql(0.6)).df()
    _cmp(eng, ora)
