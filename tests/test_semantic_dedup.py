"""Semantic dedup (SemDeDup-style): brute-force numpy replay of the full
pipeline — cell sizing, nearest-centroid assignment with tie-break, the
(centroid_sim ASC, vec_id) keep order, and the epsilon drop rule — plus
structural invariants the oracle hash can't state directly."""

import math

import numpy as np
import pyarrow.parquet as pq

from flink_http_full_cache_connector_spark.operators.dedup import (
    SEMANTIC_DUP_THRESHOLD,
    SEMANTIC_MIN_CELLS,
    semantic_cells_for,
)
from flink_http_full_cache_connector_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _model(sf_dir):
    """Pure-numpy reference: returns {vec_id: (cell_id, is_kept)}."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl["vec_id"].to_numpy()
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    n = len(ids)
    cells = semantic_cells_for(n)
    cent_mask = ids < cells
    cent_ids = ids[cent_mask]
    cent = emb[cent_mask]
    sims = (emb @ cent.T) / (
        np.linalg.norm(emb, axis=1)[:, None] * np.linalg.norm(cent, axis=1)[None, :]
    )
    # argmax with tie-break to the LOWEST cent_id: argmax takes the first
    # max, and cent rows are in ascending vec_id order in the fixture
    assert np.all(np.diff(cent_ids) > 0)
    best = sims.argmax(axis=1)
    cell = cent_ids[best]
    cent_sim = sims[np.arange(n), best]
    out = {}
    norms = np.linalg.norm(emb, axis=1)
    for c in np.unique(cell):
        members = np.where(cell == c)[0]
        order = sorted(members, key=lambda i: (cent_sim[i], ids[i]))
        for i in order:
            # drop rule compares against ALL earlier-ordered members (kept
            # or not), exactly like the registered query's pair join
            dup = any(
                (emb[i] @ emb[j]) / (norms[i] * norms[j])
                >= SEMANTIC_DUP_THRESHOLD
                for j in order
                if (cent_sim[j], ids[j]) < (cent_sim[i], ids[i])
            )
            out[int(ids[i])] = (int(c), not dup)
    return out, cells


def test_matches_numpy_brute_force(spark):
    rows = all_queries()["dedup_semantic"].spark(spark, SF_DIR).collect()
    model, cells = _model(SF_DIR)
    assert len(rows) == len(model)
    for r in rows:
        mc, mk = model[r.vec_id]
        assert r.cell_id == mc, (r.vec_id, r.cell_id, mc)
        assert r.is_kept == mk, (r.vec_id, r.is_kept, mk)


def test_first_ordered_member_of_every_cell_is_kept(spark):
    """The keep order starts at the member FARTHEST from the centroid —
    that representative can never be dropped (nothing precedes it)."""
    rows = all_queries()["dedup_semantic"].spark(spark, SF_DIR).collect()
    first = {}
    for r in rows:
        key = (r.cent_sim, r.vec_id)
        if r.cell_id not in first or key < first[r.cell_id][0]:
            first[r.cell_id] = (key, r.is_kept)
    assert first and all(kept for _, kept in first.values())


def test_cell_sizing_formula():
    for n in [0, 1, 15, 16, 255, 256, 257, 10_000, 123_456,
              99_980_001, 99_980_002]:  # 9999^2 and 9999^2+1
        assert semantic_cells_for(n) == max(SEMANTIC_MIN_CELLS, math.isqrt(n))


def _write_embeddings(tmpdir, vecs):
    import pyarrow as pa

    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/embeddings.parquet")
    return str(tmpdir)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# integer-valued components 1..8: every dot product / norm² is an exact
# small integer, so cosine doubles are bit-identical under ANY summation
# order — numpy model, Spark fold, and DuckDB fold can never disagree by
# an ulp, making ordering and threshold comparisons deterministic
_vec = st.lists(st.integers(1, 8), min_size=3, max_size=3)
_corpus = st.lists(_vec, min_size=1, max_size=32)


@settings(max_examples=10, deadline=None)
@given(vecs=_corpus)
def test_property_matches_numpy_model_on_generated_corpora(
    spark, tmp_path_factory, vecs
):
    d = _write_embeddings(tmp_path_factory.mktemp("sem"), vecs)
    rows = all_queries()["dedup_semantic"].spark(spark, d).collect()
    model, _ = _model(d)
    assert len(rows) == len(model)
    for r in rows:
        mc, mk = model[r.vec_id]
        assert (r.cell_id, r.is_kept) == (mc, mk), (r.vec_id, vecs)
