import numpy as np
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def _bench(docs):
    return docs.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0)),
        batch_format="pyarrow")


def test_curate_equals_stepwise_composition():
    from pgd_ray.pipelines.clean_corpus import clean_corpus
    from pgd_ray.pipelines.curate import curate_corpus
    from pgd_ray.text.decontam import decontaminate

    docs = _docs()
    out = curate_corpus(docs, _bench(docs)).to_pandas().sort_values(
        "doc_id", ignore_index=True)

    clean = clean_corpus(docs)
    dec = decontaminate(docs, _bench(docs), n=8).to_pandas()
    bad = set(dec.loc[dec["n_shared"] > 0, "doc_id"])
    kept = clean[~clean["doc_id"].isin(bad)].sort_values(
        "doc_id", ignore_index=True)
    start = np.concatenate(
        ([0], np.cumsum(kept["token_count"].to_numpy()[:-1])))

    assert out["doc_id"].tolist() == kept["doc_id"].tolist()
    assert out["token_count"].tolist() == kept["token_count"].tolist()
    assert np.allclose(out["quality"], kept["quality"])
    assert out["start_tok"].tolist() == start.tolist()
    assert (out["pack_id"] == out["start_tok"] // 1024).all()
    assert (out["pack_offset"] == out["start_tok"] % 1024).all()


def test_curate_pack_invariants_and_subset():
    from pgd_ray.pipelines.clean_corpus import clean_corpus
    from pgd_ray.pipelines.curate import curate_corpus

    docs = _docs()
    out = curate_corpus(docs, _bench(docs)).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    clean = clean_corpus(docs)
    assert set(out["doc_id"]) <= set(clean["doc_id"])
    # offsets tile the token stream exactly
    st = out["start_tok"].to_numpy()
    tc = out["token_count"].to_numpy()
    assert (st[1:] == st[:-1] + tc[:-1]).all()
    assert st[0] == 0
