"""INTERSECT / EXCEPT distinct set ops vs pandas set semantics."""

import numpy as np
import pandas as pd
import ray.data

from pgd_ray.stages.setops import except_distinct, intersect_distinct


def _ds(df: pd.DataFrame, blocks: int) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(blocks)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), ignore_index=True)


def _ref_sets(a: pd.DataFrame, b: pd.DataFrame, cols):
    sa = set(map(tuple, a[cols].itertuples(index=False)))
    sb = set(map(tuple, b[cols].itertuples(index=False)))
    mk = lambda s: _sorted(pd.DataFrame(sorted(s), columns=cols).astype(np.int64)) \
        if s else pd.DataFrame(columns=cols)
    return mk(sa & sb), mk(sa - sb)


def test_setops_match_reference_across_blocks():
    rng = np.random.default_rng(7)
    a = pd.DataFrame({"x": rng.integers(0, 40, 300),
                      "y": rng.integers(0, 3, 300)})
    b = pd.DataFrame({"x": rng.integers(20, 60, 250),
                      "y": rng.integers(0, 3, 250)})
    cols = ["x", "y"]
    ref_i, ref_e = _ref_sets(a, b, cols)
    got_i = _sorted(intersect_distinct(_ds(a, 7), _ds(b, 5), cols).to_pandas())
    got_e = _sorted(except_distinct(_ds(a, 7), _ds(b, 5), cols).to_pandas())
    pd.testing.assert_frame_equal(got_i.astype(np.int64), ref_i)
    pd.testing.assert_frame_equal(got_e.astype(np.int64), ref_e)


def test_setops_duplicates_collapse_and_disjoint():
    a = pd.DataFrame({"k": [1, 1, 1, 2, 2]})
    b = pd.DataFrame({"k": [3, 3, 4]})
    assert intersect_distinct(_ds(a, 3), _ds(b, 2), ["k"]).count() == 0
    got = _sorted(except_distinct(_ds(a, 3), _ds(b, 2), ["k"]).to_pandas())
    assert got["k"].tolist() == [1, 2]


def test_setops_full_overlap_and_empty_side():
    a = pd.DataFrame({"k": [5, 6, 7]})
    got = _sorted(intersect_distinct(_ds(a, 2), _ds(a.copy(), 3), ["k"]).to_pandas())
    assert got["k"].tolist() == [5, 6, 7]
    assert except_distinct(_ds(a, 2), _ds(a.copy(), 3), ["k"]).count() == 0
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    got_e = _sorted(except_distinct(_ds(a, 2), _ds(empty, 1), ["k"]).to_pandas())
    assert got_e["k"].tolist() == [5, 6, 7]


def test_union_distinct_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data

    from pgd_ray.stages.setops import union_distinct

    a = pd.DataFrame({"x": [1, 1, 2, 3], "y": [0, 0, 1, 1]})
    b = pd.DataFrame({"x": [2, 4, 4], "y": [1, 0, 0]})
    out = union_distinct(ray.data.from_pandas(a).repartition(3),
                         ray.data.from_pandas(b).repartition(2),
                         ["x", "y"]).to_pandas()
    got = set(map(tuple, out.to_numpy()))
    want = set(map(tuple, a.to_numpy())) | set(map(tuple, b.to_numpy()))
    assert got == want
