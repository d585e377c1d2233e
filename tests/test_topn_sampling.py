"""Round-2 training-pipeline additions: grouped top-k, hopping
windows, deterministic hash sampling, vocabulary top-k."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pgd_ray.stages.topn import grouped_topk, heavy_hitters
from pgd_ray.stages.windows import hopping_counts, tumbling_counts
from pgd_ray.text.analysis import vocab_topk
from pgd_ray.text.sampling import sample_by_hash

SF = "/root/testdata/sf0.001"


def _topk_ref(df, group, order, ascending, k):
    df = df.sort_values([group, *order], ascending=[True, *ascending],
                        kind="stable", ignore_index=True)
    df["rnk"] = (df.groupby(group).cumcount() + 1).astype("int64")
    return df[df["rnk"] <= k].reset_index(drop=True)


def test_grouped_topk_groups_spanning_blocks():
    """Groups large enough to straddle sorted-block boundaries must be
    re-ranked exactly by the driver stitch."""
    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 37, n),          # big groups: span blocks
            "score": rng.integers(0, 50, n),
            "tie": np.arange(n, dtype=np.int64),  # total order
        }
    )
    ds = rd.from_pandas(df).repartition(16)  # many input blocks
    out = (
        grouped_topk(ds, "g", ["score", "tie"], [True, False], k=5)
        .to_pandas()
        .sort_values(["g", "rnk"], ignore_index=True)
    )
    ref = _topk_ref(df, "g", ["score", "tie"], [False, True], 5).sort_values(
        ["g", "rnk"], ignore_index=True
    )
    assert out[["g", "score", "tie", "rnk"]].equals(ref[["g", "score", "tie", "rnk"]])


def test_grouped_topk_small_groups_many_blocks():
    rng = np.random.default_rng(11)
    n = 5_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 2_000, n),  # mostly tiny/absent groups
            "score": rng.integers(0, 9, n),
            "tie": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    out = (
        grouped_topk(ds, "g", ["score", "tie"], [True, False], k=2)
        .to_pandas()
        .sort_values(["g", "rnk"], ignore_index=True)
    )
    ref = _topk_ref(df, "g", ["score", "tie"], [False, True], 2).sort_values(
        ["g", "rnk"], ignore_index=True
    )
    assert out[["g", "score", "tie", "rnk"]].equals(ref[["g", "score", "tie", "rnk"]])


def test_heavy_hitters_matches_pandas():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    c = (
        ev.groupby(["user_id", "event_type"], as_index=False)
        .size()
        .rename(columns={"size": "n_events"})
    )
    c["n_events"] = c["n_events"].astype("int64")
    ref = _topk_ref(c, "user_id", ["n_events", "event_type"], [False, True], 3)
    out = heavy_hitters(SF, k=3).to_pandas()
    key = ["user_id", "event_type", "n_events", "rnk"]
    a = out[key].sort_values(key, ignore_index=True)
    b = ref[key].sort_values(key, ignore_index=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_hopping_counts_event_mass():
    """Every event contributes to exactly window/hop windows, and the
    tumbling windows are a subset grid of the hopping ones."""
    hop = hopping_counts(SF).to_pandas()
    tum = tumbling_counts(SF).to_pandas()
    assert hop["n_events"].sum() == 4 * tum["n_events"].sum() == 4 * 1000
    assert (hop["window_start"] % 900_000_000 == 0).all()


def test_sample_by_hash_deterministic_and_nested():
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    s25 = sample_by_hash(docs, threshold_16bit=0x4000).to_pandas()
    s50 = sample_by_hash(docs, threshold_16bit=0x8000).to_pandas()
    # deterministic: matches a direct per-row md5
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    h4 = texts["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()[:4])
    assert set(s25["doc_id"]) == set(texts["doc_id"][h4 < "4000"])
    # nested: a lower-rate sample is a subset of a higher-rate one
    assert set(s25["doc_id"]) <= set(s50["doc_id"])
    assert 0 < len(s25) < len(s50) < len(texts)


def test_vocab_topk_matches_brute_force():
    import re

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    counts = {}
    for t in texts["text"]:
        for tok in re.findall(r"[A-Za-z]+", t or ""):
            counts[tok] = counts.get(tok, 0) + 1
    ref = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = vocab_topk(docs, n=20).to_pandas()
    assert list(zip(out["token"], out["n_total"])) == ref


def test_exact_quantiles_matches_numpy_with_forced_refinement():
    from pgd_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.normal(0, 1, 30_000),
            np.full(25_000, 0.5),        # heavy tie mass
            rng.uniform(100, 101, 5_000),  # far tail
        ]
    )
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(16)
    qs = [0.0, 0.1, 0.5, 0.42, 0.9, 0.999, 1.0]
    # tiny bins/cap force several refinement rounds incl. the tie mass
    out = exact_quantiles(ds, "x", qs, bins=4, fetch_cap=50)
    srt = np.sort(vals)
    expect = [srt[int(np.floor(q * (len(vals) - 1)))] for q in qs]
    assert list(out["q"]) == qs
    assert np.array_equal(out["value"].to_numpy(), np.array(expect))


def test_exact_quantiles_all_equal_and_empty():
    from pgd_ray.stages.quantiles import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": np.full(1000, 7.25)}))
    out = exact_quantiles(ds, "x", [0.5], bins=4, fetch_cap=10)
    assert out["value"].tolist() == [7.25]
    e = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    oe = exact_quantiles(e, "x", [0.5])
    assert np.isnan(oe["value"]).all()



def test_grouped_quantiles_matches_numpy_with_forced_refinement():
    from pgd_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(7)
    n = 40_000
    grp = rng.choice(np.array(["a", "b", "c"]), n, p=[0.6, 0.3, 0.1])
    vals = rng.normal(0, 1, n) + (grp == "b") * 10 + (grp == "c") * 100
    vals[grp == "a"] = np.where(rng.random((grp == "a").sum()) < 0.4,
                                0.5, vals[grp == "a"])  # tie mass in one group
    ds = rd.from_arrow(pa.table({"g": grp, "x": vals})).repartition(16)
    qs = [0.0, 0.5, 0.9, 1.0]
    out = grouped_quantiles(ds, "g", "x", qs, bins=4, fetch_cap=50)
    for g in ("a", "b", "c"):
        srt = np.sort(vals[grp == g])
        expect = [srt[int(np.floor(q * (len(srt) - 1)))] for q in qs]
        got = out[out["g"] == g].sort_values("q")
        assert got["q"].tolist() == qs
        assert np.array_equal(got["value"].to_numpy(), np.array(expect)), g


def test_grouped_quantiles_single_row_group_and_nan():
    from pgd_ray.stages.quantiles import grouped_quantiles

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["solo", "dup", "dup", "dup"], pa.string()),
        "x": pa.array([3.5, float("nan"), 1.0, 2.0], pa.float64()),
    }))
    out = grouped_quantiles(ds, "g", "x", [0.5])
    got = dict(zip(out["g"], out["value"]))
    assert got == {"solo": 3.5, "dup": 1.0}  # NaN excluded -> n=2, rank 0


# --- property tests (small example counts: each example runs Ray ops) ---
from hypothesis import given, settings, strategies as st


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(50, 800),
    n_groups=st.integers(1, 30),
    vmax=st.integers(1, 6),
    k=st.integers(1, 4),
    nblocks=st.integers(1, 7),
    seed=st.integers(0, 10_000),
)
def test_grouped_topk_property(n, n_groups, vmax, k, nblocks, seed):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, n_groups, n),
            "score": rng.integers(0, vmax, n),
            "tie": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(nblocks)
    out = (
        grouped_topk(ds, "g", ["score", "tie"], [True, False], k=k)
        .to_pandas()
        .sort_values(["g", "rnk"], ignore_index=True)
    )
    ref = _topk_ref(df, "g", ["score", "tie"], [False, True], k).sort_values(
        ["g", "rnk"], ignore_index=True
    )
    cols = ["g", "score", "tie", "rnk"]
    assert out[cols].equals(ref[cols])


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(1, 3000),
    dup_frac=st.floats(0.0, 0.95),
    bins=st.integers(2, 16),
    cap=st.integers(1, 200),
    seed=st.integers(0, 10_000),
)
def test_exact_quantiles_property(n, dup_frac, bins, cap, seed):
    from pgd_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 10, n)
    ndup = int(n * dup_frac)
    if ndup:
        vals[:ndup] = rng.choice([-1.5, 0.0, 3.25], ndup)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(4)
    qs = [0.0, 0.03, 0.5, 0.77, 1.0]
    out = exact_quantiles(ds, "x", qs, bins=bins, fetch_cap=cap)
    srt = np.sort(vals)
    expect = np.array([srt[int(np.floor(q * (n - 1)))] for q in qs])
    assert np.array_equal(out["value"].to_numpy(), expect)


def test_grouped_distinct_count_matches_pandas():
    from pgd_ray.stages.distinct import grouped_distinct_count

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ref = (
        ev.groupby("event_type")["user_id"].nunique().rename("n_users").reset_index()
    )
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    out = (
        grouped_distinct_count(ds, "event_type", "user_id", alias="n_users")
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    ref = ref.sort_values("event_type", ignore_index=True)
    assert out.equals(ref.astype(out.dtypes.to_dict()))


def test_sample_by_hash_threshold_boundaries_and_nulls():
    docs = rd.from_arrow(
        pa.table({"doc_id": np.arange(6, dtype=np.int64),
                  "text": ["a", "b", None, "", "dd", None]})
    )
    # keep-all boundary: every NON-NULL row survives
    allr = sample_by_hash(docs, threshold_16bit=0x10000).to_pandas()
    assert sorted(allr["doc_id"]) == [0, 1, 3, 4]
    # keep-none boundary
    assert sample_by_hash(docs, threshold_16bit=0).count() == 0
    # null text is dropped, never hashed as ""
    some = sample_by_hash(docs, threshold_16bit=0xFFFF).to_pandas()
    assert 2 not in set(some["doc_id"]) and 5 not in set(some["doc_id"])


def test_grouped_topk_hot_key_spanning_blocks_is_driver_capped():
    """One group holding 90% of all rows across many blocks must still
    rank exactly — and the local-rank pre-cut means the driver only
    ever sees O(k * blocks) boundary rows."""
    n = 30_000
    rng = np.random.default_rng(5)
    g = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 10, n))
    df = pd.DataFrame(
        {"g": g, "score": rng.integers(0, 1000, n),
         "tie": np.arange(n, dtype=np.int64)}
    )
    ds = rd.from_pandas(df).repartition(24)
    out = (
        grouped_topk(ds, "g", ["score", "tie"], [True, False], k=4)
        .to_pandas()
        .sort_values(["g", "rnk"], ignore_index=True)
    )
    ref = _topk_ref(df, "g", ["score", "tie"], [False, True], 4).sort_values(
        ["g", "rnk"], ignore_index=True
    )
    cols = ["g", "score", "tie", "rnk"]
    assert out[cols].equals(ref[cols])


def test_exact_quantiles_nan_and_bigint_exactness():
    from pgd_ray.stages.quantiles import exact_quantiles

    vals = np.array([np.nan, 1.0, np.nan, 3.0, 2.0, np.nan])
    ds = rd.from_arrow(pa.table({"x": vals}))
    out = exact_quantiles(ds, "x", [0.0, 0.5, 1.0], bins=4, fetch_cap=2)
    assert out["value"].tolist() == [1.0, 2.0, 3.0]
    # int64 beyond 2^53: adjacent values float64 would collapse must
    # come back EXACT via the integer refinement path
    base = 2**60
    tvals = base + np.arange(1000, dtype=np.int64) * 3 + 1  # 2^60+1, +4, ...
    rng = np.random.default_rng(2)
    tvals = tvals[rng.permutation(1000)]
    big = rd.from_arrow(pa.table({"t": tvals})).repartition(8)
    qs = [0.0, 0.333, 0.5, 1.0]
    out = exact_quantiles(big, "t", qs, bins=8, fetch_cap=16)
    srt = np.sort(tvals)
    expect = [int(srt[int(np.floor(q * 999))]) for q in qs]
    assert out["value"].tolist() == expect
    assert all(isinstance(v, (int, np.integer)) for v in out["value"])
    # tie-heavy narrow integer range exercises the unit-bin path
    tie = rd.from_arrow(pa.table({"t": np.array([5] * 500 + [6] * 300 + [7] * 200,
                                                np.int64)}))
    out2 = exact_quantiles(tie, "t", [0.0, 0.49, 0.6, 0.95, 1.0],
                           bins=4, fetch_cap=10)
    assert out2["value"].tolist() == [5, 5, 6, 7, 7]


def test_grouped_distinct_count_excludes_nulls():
    from pgd_ray.stages.distinct import grouped_distinct_count

    t = pa.table({"k": ["a", "a", "a", "b", "b"],
                  "v": pa.array([1, 1, None, None, 2], pa.int64())})
    out = (
        grouped_distinct_count(rd.from_arrow(t), "k", "v")
        .to_pandas().sort_values("k", ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"k": "a", "n_distinct": 1}, {"k": "b", "n_distinct": 1}]


def test_hll_estimate_error_bound_and_merge():
    from pgd_ray.stages.cardinality import approx_distinct, hll_estimate, hll_registers

    n_true = 100_000
    vals = np.arange(n_true, dtype=np.int64) * 2_654_435_761 % (1 << 62)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    # RSE = 1.04/sqrt(4096) ~ 1.6%; assert within 5 sigma
    assert abs(est - n_true) / n_true < 0.08
    # duplicates must not change the registers (set semantics)
    dup = rd.from_arrow(pa.table({"v": np.concatenate([vals, vals[:50_000]])}))
    r1 = hll_registers(ds, "v", p=12).to_pandas().sort_values("bucket", ignore_index=True)
    r2 = hll_registers(dup, "v", p=12).to_pandas().sort_values("bucket", ignore_index=True)
    assert r1.equals(r2)
    # merging two halves' registers (max per bucket) == whole
    a = hll_registers(rd.from_arrow(pa.table({"v": vals[:60_000]})), "v").to_pandas()
    b = hll_registers(rd.from_arrow(pa.table({"v": vals[60_000:]})), "v").to_pandas()
    merged = (
        pd.concat([a, b]).groupby("bucket", as_index=False)["rho"].max()
        .sort_values("bucket", ignore_index=True)
    )
    assert merged.equals(r1)
    # small-range correction: tiny cardinality is near-exact
    small = rd.from_arrow(pa.table({"v": np.arange(40, dtype=np.int64)}))
    assert abs(approx_distinct(small, "v", p=12) - 40) < 2


def test_stratified_sample_rates_and_default():
    from pgd_ray.text.sampling import stratified_sample

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    out = stratified_sample(
        docs, "lang", {"en": 0x4000, "zh": 0xC000}, default_16bit=0x8000
    ).to_pandas()
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "text"]).to_pandas()
    h4 = ref["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()[:4])
    thr = ref["lang"].map({"en": "4000", "zh": "c000"}).fillna("8000")
    assert set(out["doc_id"]) == set(ref["doc_id"][h4 < thr])
    # keep-all default: groups not in the map survive entirely
    all_out = stratified_sample(docs, "lang", {"en": 0x0}).to_pandas()
    assert set(all_out["lang"]) == set(ref["lang"]) - {"en"} or \
        "en" not in set(all_out["lang"])
    assert (ref["lang"] != "en").sum() == len(all_out)


def test_cap_per_group_deterministic_uniform_cap():
    from pgd_ray.text.sampling import cap_per_group

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    out = cap_per_group(docs, "source", 5, id_col="doc_id").to_pandas()
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "text"]).to_pandas()
    ref["md5"] = ref["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    ref = ref.sort_values(["source", "md5", "doc_id"], ignore_index=True)
    ref["rnk"] = ref.groupby("source").cumcount() + 1
    ref = ref[ref["rnk"] <= 5]
    key = ["source", "doc_id", "md5", "rnk"]
    a = out[key].sort_values(key, ignore_index=True)
    b = ref[key].sort_values(key, ignore_index=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    assert (out.groupby("source").size() <= 5).all()


def test_pack_assignments_prefix_sum_invariants():
    import re as _re

    from pgd_ray.text.analysis import TOKEN_RE
    from pgd_ray.text.packing import pack_assignments

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = (
        pack_assignments(docs.repartition(16), pack_len=256)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    ref = ref.sort_values("doc_id", ignore_index=True)
    tok = _re.compile(TOKEN_RE, _re.ASCII)
    nt = ref["text"].str.count(tok).astype("int64").to_numpy()
    start = np.concatenate(([0], np.cumsum(nt[:-1])))
    assert np.array_equal(out["n_tokens"].to_numpy(), nt)
    assert np.array_equal(out["start_tok"].to_numpy(), start)
    assert np.array_equal(out["pack_id"].to_numpy(), start // 256)
    assert np.array_equal(out["pack_offset"].to_numpy(), start % 256)
    # contiguity: every token position is covered exactly once
    assert out["start_tok"].iloc[-1] + out["n_tokens"].iloc[-1] == nt.sum()


def test_repetition_stats_matches_brute_force():
    import re as _re

    from pgd_ray.text.analysis import repetition_stats

    texts = ["a b c d e f g h", "x x x x x", "one two one two one two",
             "", "solo", "p q r p q r p q s"]
    docs = rd.from_arrow(pa.table({"doc_id": np.arange(6, dtype=np.int64),
                                   "text": texts}))
    out = repetition_stats(docs).to_pandas().sort_values("doc_id", ignore_index=True)
    for i, t in enumerate(texts):
        ws = _re.findall(r"[A-Za-z]+", t)
        n = len(ws)
        row = out.iloc[i]
        assert row["n_words"] == n
        if n:
            from collections import Counter
            c = Counter(ws)
            assert row["dup_word_frac"] == round(1 - len(c) / n, 6)
            assert row["top_word_frac"] == round(max(c.values()) / n, 6)
            tris = [" ".join(ws[j:j+3]) for j in range(n - 2)]
            if tris:
                assert row["dup_3gram_frac"] == round(1 - len(set(tris)) / len(tris), 6)
            else:
                assert row["dup_3gram_frac"] == 0.0
        else:
            assert (row[["dup_word_frac", "top_word_frac", "dup_3gram_frac"]] == 0).all()
    # repeated-word docs are dropped; clean prose kept; a one-word doc
    # is (correctly) dropped by the top-word rule (top_word_frac = 1.0)
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[0] and not keep[1] and not keep[2] and not keep[4]


def test_embedding_dim_stats_matches_numpy():
    from pgd_ray.stages.vector_stats import embedding_dim_stats

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    out = embedding_dim_stats(ds.repartition(8)).to_pandas().sort_values(
        "dim", ignore_index=True
    )
    ref = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"]).to_pandas()
    m = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    assert np.array_equal(out["n"].to_numpy(), np.full(m.shape[1], m.shape[0]))
    assert np.allclose(out["mean"], m.mean(axis=0), atol=1e-6)
    assert np.allclose(out["std"], m.std(axis=0), atol=1e-6)
    assert np.allclose(out["vmin"], m.min(axis=0), atol=1e-6)
    assert np.allclose(out["vmax"], m.max(axis=0), atol=1e-6)


def test_cooccurrence_pairs_matches_brute_force():
    from pgd_ray.stages.windows import cooccurrence_pairs

    W = 300_000_000
    out = (
        cooccurrence_pairs(SF, window_us=W)
        .to_pandas()
        .sort_values(["type_a", "type_b"], ignore_index=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    rows = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], ignore_index=True)
        t = g["ts_us"].to_numpy(); e = g["event_type"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if t[j] - t[i] > W:
                    break
                k = tuple(sorted((e[i], e[j])))
                rows[k] = rows.get(k, 0) + 1
    ref = (
        pd.DataFrame([(a, b, n) for (a, b), n in rows.items()],
                     columns=["type_a", "type_b", "n_pairs"])
        .sort_values(["type_a", "type_b"], ignore_index=True)
    )
    assert out.equals(ref.astype(out.dtypes.to_dict()))

def test_weighted_sample_topk_deterministic_and_partition_invariant():
    from pgd_ray.text.hashing import splitmix64
    from pgd_ray.text.sampling import weighted_sample_topk

    rng = np.random.default_rng(2)
    n = 3000
    ids = rng.permutation(np.arange(10_000, dtype=np.int64))[:n]
    w = rng.integers(1, 500, n).astype(np.float64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "n_chars": pa.array(w, pa.float64())})
    u = ((splitmix64(ids) >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0**-53
    score = np.log(u) / w
    order = np.lexsort((ids, -score))[:25]
    for parts in (1, 13):
        got = weighted_sample_topk(
            rd.from_arrow(t).repartition(parts), k=25)
        assert got["doc_id"].tolist() == ids[order].tolist(), parts
        assert np.allclose(got["score"], score[order])
    # heavier rows must dominate the sample on average
    got = weighted_sample_topk(rd.from_arrow(t), k=300)
    assert got["n_chars"].mean() > w.mean()


def test_mixture_weights_temperature_semantics():
    import pandas as pd
    import ray.data as rd

    from pgd_ray.text.sampling import mixture_weights

    docs = pd.DataFrame({
        "source": ["big"] * 90 + ["small"] * 10,
        "text": ["one two three four five"] * 90 + ["a b"] * 10,
    })
    ds = rd.from_pandas(docs).repartition(5)
    out = mixture_weights(ds, tau=0.5).set_index("source")
    assert out["tokens"]["big"] == 90 * 5 and out["tokens"]["small"] == 10 * 2
    assert abs(out["w"].sum() - 1.0) < 1e-5
    # τ<1 upsamples the tail source, downsamples the head
    assert out["boost"]["small"] > 1.0 > out["boost"]["big"]
    # τ=1 is the natural distribution: boost == 1 everywhere
    nat = mixture_weights(ds, tau=1.0)
    assert (nat["boost"] == 1.0).all()
