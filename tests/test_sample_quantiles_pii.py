"""Kernel tests: stratified sampling, exact histogram quantiles, PII scrub."""
import numpy as np
import pyarrow as pa

from osm2world_ray.stages.quantiles import (
    _compact_hist,
    _finalize_quantiles,
    partial_value_hist,
)
from osm2world_ray.stages.sample import (
    sample_hash,
    stratified_sample_batch,
)
from osm2world_ray.stages.textstats import pii_augment_batch, pii_scrub_batch


def test_sample_deterministic_and_stratified():
    n = 2000
    batch = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array((["en", "de", "zh", "xx"] * (n // 4))),
        "source": pa.array(["s"] * n),
    })
    a = stratified_sample_batch(batch).to_pandas()
    b = stratified_sample_batch(batch).to_pandas()
    assert a.equals(b)
    # en keeps everything (1000 permille); xx uses the default 100
    assert (a[a["lang"] == "en"].shape[0]) == n // 4
    assert 0 < a[a["lang"] == "xx"].shape[0] < n // 8
    # membership matches the hash rule exactly
    for row in a.itertuples():
        h = sample_hash(np.array([row.doc_id]))[0] % 1000
        assert h < {"en": 1000, "de": 500, "zh": 125}.get(row.lang, 100)


def test_sample_batch_split_invariance():
    # same membership regardless of how rows are batched (map-only op)
    n = 1000
    batch = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(["de"] * n),
        "source": pa.array(["s"] * n),
    })
    whole = stratified_sample_batch(batch)["doc_id"].to_pylist()
    parts = []
    for lo in range(0, n, 137):
        parts += stratified_sample_batch(batch.slice(lo, 137))["doc_id"].to_pylist()
    assert whole == parts


def test_quantiles_exact_vs_numpy():
    rng = np.random.RandomState(7)
    vals = rng.randint(1, 500, size=5000) / 100.0
    types = rng.choice(["a", "b", "c"], size=5000)
    batch = pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
    # split into partials, merge, finalize
    parts = [partial_value_hist(batch.slice(i, 613)) for i in range(0, 5000, 613)]
    acc = _compact_hist(pa.concat_tables(parts))
    out = _finalize_quantiles(acc).to_pandas().set_index("event_type")
    for t in ("a", "b", "c"):
        v100 = np.floor(vals[types == t] * 100 + 0.5).astype(np.int64)
        v100.sort()
        n = len(v100)
        for p in (50, 90, 99):
            target = (p * n + 99) // 100
            assert out.loc[t, f"p{p}_c"] == v100[target - 1]
        assert out.loc[t, "n_events"] == n


def test_quantiles_empty():
    empty = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
    })
    out = _finalize_quantiles(partial_value_hist(empty))
    assert len(out) == 0
    assert out.schema.names == ["event_type", "p50_c", "p90_c", "p99_c", "n_events"]


def test_pii_scrub_masks_and_counts():
    batch = pa.table({
        "doc_id": pa.array([15, 7, 3, 5], type=pa.int64()),
        "text": pa.array(["hello world", "plain", "mail me", "ring me"]),
    })
    out = pii_scrub_batch(pii_augment_batch(batch)).to_pandas().set_index("doc_id")
    # doc 15: email (15%3==0) + phone (15%5==0); doc 7 neither;
    # doc 3 email only; doc 5 phone only
    assert list(out.loc[[15, 7, 3, 5], "n_emails"]) == [1, 0, 1, 0]
    assert list(out.loc[[15, 7, 3, 5], "n_phones"]) == [1, 0, 0, 1]
    # masked text contains no residual PII (verify via a direct rebuild)
    import hashlib
    masked15 = "hello world contact15@example.com call +1-555-0015"
    masked15 = masked15.replace("contact15@example.com", "[EMAIL]")
    masked15 = masked15.replace("+1-555-0015", "[PHONE]")
    assert out.loc[15, "masked_md5"] == hashlib.md5(masked15.encode()).hexdigest()
    assert out.loc[15, "masked_len"] == len(masked15)


def test_pii_scrub_existing_pii_in_text():
    # PII already in the corpus (not injected) is scrubbed too
    batch = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["leak a1@example.com and b2@example.com here"]),
    })
    out = pii_scrub_batch(pii_augment_batch(batch)).to_pandas()
    assert out.loc[0, "n_emails"] == 2


def test_vocab_partials_df_tf_and_batch_invariance():
    from osm2world_ray.stages.textstats import vocab_partials, vocab_rollup_group
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b a", "a c", "b b b"]),
    })
    whole = vocab_rollup_group(vocab_partials(batch, n_buckets=8)).to_pandas()
    whole = whole.sort_values("token", ignore_index=True)
    assert list(whole["token"]) == ["a", "b", "c"]
    assert list(whole["df"]) == [2, 2, 1]
    assert list(whole["tf"]) == [3, 4, 1]
    # partials summed across any batch split give the same totals
    parts = pa.concat_tables([
        vocab_partials(batch.slice(i, 1), n_buckets=8) for i in range(3)
    ])
    split = vocab_rollup_group(parts).to_pandas().sort_values(
        "token", ignore_index=True)
    assert split.equals(whole)


def test_passage_partials_batch_invariance():
    from osm2world_ray.stages.dedup import (
        passage_partials,
        passage_rollup_group,
    )
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "the cat sat on the mat today",
            "yes the cat sat on a rug",
            "entirely different words here now",
        ]),
    })
    whole = passage_rollup_group(
        passage_partials(batch, n_buckets=8)
    ).to_pandas().sort_values("shingle_hash", ignore_index=True)
    # "the cat sat" / "cat sat on" appear in docs 0 and 1
    assert len(whole) >= 2 and (whole["n_docs"] == 2).all()
    parts = pa.concat_tables([
        passage_partials(batch.slice(i, 1), n_buckets=8) for i in range(3)
    ])
    split = passage_rollup_group(parts).to_pandas().sort_values(
        "shingle_hash", ignore_index=True)
    assert split.equals(whole)
