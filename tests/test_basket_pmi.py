import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _sfdir(tmp_path, **tables):
    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp_path / "sfdir" / f"{name}.parquet")
    return str(tmp_path / "sfdir")


def test_basket_lift_matches_brute(tmp_path):
    from itertools import combinations

    from pgd_ray.stages.basket import basket_lift

    rng = np.random.default_rng(3)
    rows = []
    for o in range(40):
        parts = rng.choice(20, size=rng.integers(1, 6), replace=False)
        for p in parts:
            # duplicate lineitems for the same (order, part) on purpose
            for _ in range(1 + (rng.random() < 0.3)):
                rows.append((o, int(p)))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = _sfdir(tmp_path, lineitem=li)

    got = basket_lift(sf, min_both=2)

    po = li.drop_duplicates()
    n = po["l_orderkey"].nunique()
    ic = po.groupby("l_partkey").size()
    from collections import Counter
    pc = Counter()
    for _, grp in po.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"]), 2):
            pc[(a, b)] += 1
    ref = sorted((a, b, c) for (a, b), c in pc.items() if c >= 2)
    assert [(r.part_a, r.part_b, r.n_both)
            for r in got.itertuples()] == ref
    for r in got.itertuples():
        want = (r.n_both * float(n)) / float(ic[r.part_a] * ic[r.part_b])
        assert abs(r.lift - want) < 1e-6


def test_pmi_collocations_matches_brute(tmp_path, ray_session):
    import re

    import ray

    from pgd_ray.text.lm import pmi_collocations

    texts = ["the cat sat on the mat " * 3,
             "the cat ran on the mat",
             "dogs ran far", ""]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(docs)
    got = pmi_collocations(ds, min_count=3)

    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = re.findall("[A-Za-z]+", t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(bi.values())
    ref = sorted((a, b, c) for (a, b), c in bi.items() if c >= 3)
    assert [(r.w1, r.w2, r.n_pair) for r in got.itertuples()] == ref
    for r in got.itertuples():
        want = np.log((bi[(r.w1, r.w2)] / nb)
                      / ((uni[r.w1] / nu) * (uni[r.w2] / nu)))
        assert abs(r.pmi - want) < 1e-6


def test_decayed_counts_matches_brute(tmp_path):
    from pgd_ray.stages.windows import decayed_counts

    rng = np.random.default_rng(8)
    n = 200
    ts_us = rng.integers(0, 30 * 86_400_000_000, n)
    et = rng.choice(np.array(["a", "b"]), n)
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": et,
        "value": np.ones(n),
    })
    sf = _sfdir(tmp_path, events=ev)
    got = decayed_counts(sf).set_index("event_type")["decayed_n"]
    tmax = ts_us.max()
    for t in ["a", "b"]:
        want = np.exp(-(tmax - ts_us[et == t]).astype(float)
                      / 604_800_000_000.0).sum()
        assert abs(got[t] - want) < 1e-6


def test_type_user_jaccard_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pgd_ray.stages.basket import type_user_jaccard

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    out = type_user_jaccard(SF)
    types = sorted(sets)
    expect = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                expect[(a, b)] = (inter, len(sets[a]), len(sets[b]),
                                  inter / len(sets[a] | sets[b]))
    assert len(out) == len(expect)
    for r in out.itertuples(index=False):
        e = expect[(r.type_a, r.type_b)]
        assert (r.n_both, r.n_a, r.n_b) == e[:3]
        assert abs(r.jaccard - round(e[3], 9)) < 1e-12


def test_mask_overlap_counts_fallback_matches_mask_path():
    """Regression (ADVICE r3): vocabularies past MASK_VOCAB_LIMIT must
    not allocate 2^T histograms or overflow int64 bits — the pairwise
    fallback must produce identical counts to the mask path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import pgd_ray.stages.basket as bk

    rng = np.random.default_rng(7)
    items = [f"t{i:02d}" for i in range(40)]  # > MASK_VOCAB_LIMIT
    keys, its = [], []
    for k in range(60):
        chosen = rng.choice(40, size=rng.integers(1, 8), replace=False)
        for c in chosen:
            keys.append(f"c{k}")
            its.append(items[c])
    pairs = rd.from_arrow(pa.table({"k": keys, "it": its}))
    # fallback (vocab 40 > limit 32)
    pf, nf, kf = bk.mask_overlap_counts(pairs, "k", "it", items)
    # force the mask path on the same input by raising the limit
    old = bk.MASK_VOCAB_LIMIT
    bk.MASK_VOCAB_LIMIT = 64
    try:
        pm, nm, km = bk.mask_overlap_counts(pairs, "k", "it", items)
    finally:
        bk.MASK_VOCAB_LIMIT = old
    assert kf == km and nf == nm
    a = pf.sort_values(["item_a", "item_b"], ignore_index=True)
    b = pm.sort_values(["item_a", "item_b"], ignore_index=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))
