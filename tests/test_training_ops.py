"""Training-data operator tests: dedup / text stats / ANN kernels, plus
run-twice determinism for the rows-only (non-SQL-oracle) queries."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kernel units
# ---------------------------------------------------------------------------

def test_minhash_identical_and_disjoint():
    from osm2world_ray.stages.dedup import minhash_signature

    a = "the quick brown fox jumps over the lazy dog again and again"
    sig_a = minhash_signature(a)
    assert sig_a.shape == (64,)
    assert np.array_equal(sig_a, minhash_signature(a))
    b = "completely different words entirely unrelated to anything before"
    frac_equal = (sig_a == minhash_signature(b)).mean()
    assert frac_equal < 0.2


def test_minhash_near_duplicate_similarity():
    from osm2world_ray.stages.dedup import minhash_signature, token_ngrams, jaccard

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base + "lambda mu"
    j = jaccard(token_ngrams(base), token_ngrams(near))
    est = (minhash_signature(base) == minhash_signature(near)).mean()
    assert abs(est - j) < 0.25  # 64 perms -> coarse but unbiased


def test_simhash_stability_and_locality():
    from osm2world_ray.stages.dedup import simhash64

    t = "one two three four five six seven eight nine ten"
    assert simhash64(t) == simhash64(t)
    near = t + " eleven"
    ham = bin(simhash64(t) ^ simhash64(near)).count("1")
    far = "totally different content with other tokens here now"
    ham_far = bin(simhash64(t) ^ simhash64(far)).count("1")
    assert ham < ham_far


def test_charset_jaccard_matches_duckdb():
    from osm2world_ray.stages.dedup import charset_jaccard_pairs

    texts = ["hello world", "hello there", "abcabc", "xyz", "hello worlds"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = charset_jaccard_pairs(df, threshold=0.0)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(floor(jaccard(a.text, b.text)*1000 + 0.5) AS BIGINT)
                 AS jaccard_mil
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b
        """
    ).df()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    exp = exp.astype({"doc_a": np.int64, "doc_b": np.int64, "jaccard_mil": np.int64})
    pd.testing.assert_frame_equal(got, exp)


def test_within_group_pairs():
    from osm2world_ray.stages.overlaps import _within_group_pairs

    ii, jj = _within_group_pairs(np.array([3, 1, 2]))
    pairs = set(zip(ii.tolist(), jj.tolist()))
    assert pairs == {(0, 1), (0, 2), (1, 2), (4, 5)}
    ii, jj = _within_group_pairs(np.array([1, 1]))
    assert len(ii) == 0


def test_line_cells_covers_endpoints_and_count():
    from osm2world_ray.geo.cells import line_cells

    # a long diagonal: cells crossed ~ dx + dy + 1, not dx * dy
    r = 5
    x1, y1, x2, y2 = (np.array([-9.9]), np.array([40.1]),
                      np.array([9.9]), np.array([49.9]))
    row, cx, cy = line_cells(r, x1, y1, x2, y2)
    assert (row == 0).all()
    scale = 1 << r
    exp_start = (int((x1[0] + 180) * scale), int((y1[0] + 90) * scale))
    exp_end = (int((x2[0] + 180) * scale), int((y2[0] + 90) * scale))
    cells = set(zip(cx.tolist(), cy.tolist()))
    assert exp_start in cells and exp_end in cells
    dx = abs(exp_end[0] - exp_start[0])
    dy = abs(exp_end[1] - exp_start[1])
    # dx+dy+1 minus one per (near-)corner crossing; far below bbox area
    assert max(dx, dy) + 1 <= len(cells) <= dx + dy + 2
    assert len(cells) < dx * dy  # the bbox fan-out this replaces


def test_brute_force_topk_kernel():
    import pyarrow as pa

    from osm2world_ray.stages.ann import BruteForceTopK, topk_finalize

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array([list(map(float, row)) for row in emb],
                                   type=pa.list_(pa.float32())),
        }
    )
    q = tbl.slice(0, 2)
    stage = BruteForceTopK(q, k=3)
    out = topk_finalize(stage(tbl), k=3)
    df = out.to_pandas()
    assert set(df["q_id"]) == {0, 1}
    assert list(df[df.q_id == 0]["rank"]) == [1, 2, 3]
    # exact check vs numpy for q=0
    e = emb.astype(np.float64)
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    cos = e @ e[0]
    cos[0] = -np.inf
    best = np.argsort(-cos, kind="stable")[:3]
    assert list(df[df.q_id == 0]["vec_id"]) == best.tolist()


def test_connected_components_chain_and_singletons(ray_session):
    """Long chain whose edges hash into many different buckets must
    still contract to one component; isolated nodes label themselves;
    quotient conflicts exclude self rows."""
    import ray.data as rd

    from osm2world_ray.stages.components import connected_components

    n = 200
    edges = rd.from_items(
        [{"src": i, "dst": i + 1} for i in range(n - 1)]
    )
    nodes = rd.from_items([{"node": i} for i in range(n + 5)])
    labels = connected_components(nodes, edges).to_pandas()
    labels = labels.sort_values("node").reset_index(drop=True)
    assert (labels.loc[labels.node < n, "label"] == 0).all()
    # the 5 extra nodes are singletons
    tail = labels[labels.node >= n]
    assert (tail["label"].to_numpy() == tail["node"].to_numpy()).all()
    assert len(labels) == n + 5


def test_connected_components_recursive_contraction(ray_session):
    """Forcing a tiny driver-quotient budget must exercise the
    recursive contraction path and still produce min-label components."""
    import ray.data as rd

    from osm2world_ray.stages.components import connected_components

    n = 120
    edges = rd.from_items([{"src": i, "dst": i + 1} for i in range(n - 1)])
    nodes = rd.from_items([{"node": i} for i in range(n + 3)])
    labels = connected_components(
        nodes, edges, max_driver_quotient=2
    ).to_pandas().sort_values("node").reset_index(drop=True)
    assert (labels.loc[labels.node < n, "label"] == 0).all()
    tail = labels[labels.node >= n]
    assert (tail["label"].to_numpy() == tail["node"].to_numpy()).all()
    assert len(labels) == n + 3


def test_np_union_find_matches_min_label():
    from osm2world_ray.stages.components import np_union_find

    rng = np.random.default_rng(11)
    src = rng.integers(0, 300, 500)
    dst = rng.integers(0, 300, 500)
    nodes, roots = np_union_find(src, dst)
    # reference: dict union-find
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for s, d in zip(src.tolist(), dst.tolist()):
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = np.array([find(int(x)) for x in nodes])
    assert np.array_equal(roots, exp)


def test_java_random_golden():
    """Bit-exact java.util.Random parity (public LCG constants; the
    scattering determinism contract, GeometryUtil.java:745-758)."""
    from osm2world_ray.stages.linework import JavaRandom

    r = JavaRandom(42)
    assert [r.next_double() for _ in range(4)] == [
        0.7275636800328681, 0.6832234717598454,
        0.30871945533265976, 0.27707849007413665,
    ]
    r0 = JavaRandom(0)
    assert [r0.next_double() for _ in range(2)] == [
        0.730967787376657, 0.24053641567148587,
    ]


def test_scatter_points_inside_and_deterministic():
    from osm2world_ray.stages.linework import distribute_points_on_rect

    pts = distribute_points_on_rect(7, -1.0, 2.0, -0.96, 2.02, 100 / 0.0004)
    assert pts == distribute_points_on_rect(7, -1.0, 2.0, -0.96, 2.02, 100 / 0.0004)
    assert len(pts) > 0
    assert all(-1.0 <= x <= -0.96 and 2.0 <= z <= 2.02 for x, z in pts)


def test_vectorized_scatter_matches_loop_reference():
    """Closed-form LCG candidate addressing must replay the sequential
    java.util.Random stream bit-for-bit."""
    import pyarrow as pa

    from osm2world_ray.sources import synth
    from osm2world_ray.stages.linework import (
        ScatterPoints,
        distribute_points_on_rect,
    )

    lat = np.array([48.52, 43.7])
    lon = np.array([13.42, -3.3])
    urls = [f"{synth.URL_PREFIX}{d}" for d in [5, 77]]
    batch = pa.table(
        {
            "url": pa.array(urls),
            "mention_idx": pa.array([0, 1], type=pa.int64()),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
        }
    )
    sp = ScatterPoints()
    got = sp(batch).to_pandas()
    rows = []
    for i, u in enumerate(urls):
        d = int(u[len(synth.URL_PREFIX):])
        pts = distribute_points_on_rect(
            d * 4 + i,
            lon[i] - synth.RLON, lat[i] - synth.RLAT,
            lon[i] + synth.RLON, lat[i] + synth.RLAT,
            sp.density,
        )
        rows.extend(
            (u, i, j, int(np.floor(x * 1e6 + 0.5)), int(np.floor(z * 1e6 + 0.5)))
            for j, (x, z) in enumerate(pts)
        )
    exp = pd.DataFrame(
        rows, columns=["url", "mention_idx", "point_idx", "px_udeg", "py_udeg"]
    )
    got = got.sort_values(["url", "point_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["url", "point_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


# ---------------------------------------------------------------------------
# rows-only queries: run twice, identical result (determinism invariant)
# ---------------------------------------------------------------------------

ROWS_ONLY = ["dedup_minhash_lsh", "dedup_simhash", "lang_id", "ann_lsh_cosine",
             "ann_ivf_cosine", "scatter_points"]


def test_ivf_recall_vs_brute_force(ray_session):
    """IVF with label-derived centroids should recover most of the
    exact top-5 (labels ARE the cluster structure of the synth data)."""
    from osm2world_ray.pipelines.queries import all_queries

    qs = all_queries()
    exact = qs["knn_brute_cosine"](SF).to_pandas()
    approx = qs["ann_ivf_cosine"](SF).to_pandas()
    e = set(zip(exact["q_id"], exact["vec_id"]))
    a = set(zip(approx["q_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    # the synthetic labels are only weakly correlated with cosine
    # neighborhoods (intra-label cos ~0.02), so nprobe=4 of 10 cells
    # bounds achievable recall; assert it beats the random-pruning
    # baseline (~0.4) rather than a structured-data bar
    assert recall >= 0.4, recall


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_deterministic(name, ray_session):
    from osm2world_ray.pipelines.queries import all_queries

    fn = all_queries()[name]

    def run():
        res = fn(SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        cols = sorted(df.columns)
        return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)

    a, b = run(), run()
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_assign_determinism_and_ties():
    import numpy as np
    from osm2world_ray.stages.kmeans import _assign

    emb = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    cents = np.array([[0.0, 0.0], [1.0, 1.0]])
    a = _assign(emb, cents)
    assert a.tolist() == [0, 1, 0]  # exact tie -> smallest cluster idx
