import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pgd_ray.text.analysis import fingerprints, lang_id, text_stats
from pgd_ray.text.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


def test_text_stats_vs_duckdb():
    import duckdb

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    ours = text_stats(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = duckdb.sql(
        """SELECT doc_id, CAST(length(text) AS BIGINT) n_chars,
           CAST(length(regexp_extract_all(text,'\\w+|[^\\w\\s]')) AS BIGINT) token_count
           FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"""
    ).df()
    assert (ours["n_chars"].to_numpy() == ref["n_chars"].to_numpy()).all()
    assert (ours["token_count"].to_numpy() == ref["token_count"].to_numpy()).all()


def test_exact_dedup():
    docs = _docs(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    out = exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out["n_dups"].tolist() == [3, 2, 1]


def test_minhash_finds_near_duplicates():
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    texts = [
        base,
        base.replace("lazy", "sleepy"),           # near-dup of 0
        "completely different content about database query engines and arrow batches",
        base.replace("quick", "rapid"),           # near-dup of 0/1
        "another unrelated string with vectors and embeddings in a ray data pipeline",
    ]
    out = minhash_lsh_dedup(_docs(texts), threshold=0.5).to_pandas()
    g = out.set_index("doc_id")["dup_group"]
    assert g[0] == g[1] == g[3]
    assert g[2] != g[0] and g[4] != g[0] and g[2] != g[4]


def test_minhash_deterministic():
    texts = ["some text here " * 5, "other text there " * 5]
    a = minhash_lsh_dedup(_docs(texts), threshold=0.5).to_pandas().sort_values("doc_id", ignore_index=True)
    b = minhash_lsh_dedup(_docs(texts), threshold=0.5).to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_simhash_pairs():
    # long doc with skewed token frequencies (realistic for simhash:
    # majority margins scale with √len, so a 1-token edit flips few bits)
    rng = np.random.default_rng(11)
    vocab = [f"word{i}" for i in range(200)]
    probs = 1.0 / np.arange(1, 201)
    probs /= probs.sum()
    toks = rng.choice(vocab, 800, p=probs)
    base = " ".join(toks)
    edited = " ".join(np.concatenate([toks, ["zzznew"]]))
    texts = [base, edited, "totally different words entirely unrelated content"]
    out = simhash_dedup(_docs(texts), max_hamming=3)
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_embedding_neardup_and_lang():
    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    vecs = [base, base + rng.standard_normal(16) * 0.01, rng.standard_normal(16)]
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(3), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    )
    out = embedding_neardup(emb, threshold=0.95)
    assert set(map(tuple, out[["vec_a", "vec_b"]].to_numpy())) == {(0, 1)}

    docs = _docs(["the cat and the dog of a house", "der Hund ist nicht mit der Katze",
                  "el perro y la casa es un gato", "xyzzy qwerty"])
    langs = lang_id(docs).to_pandas().sort_values("doc_id")["lang_pred"].tolist()
    assert langs[0] == "en" and langs[1] == "de" and langs[2] == "es" and langs[3] == "und"


def test_fingerprints_match_duckdb_md5():
    import duckdb

    texts = ["Hello  World", "hello world", "  spaced   out  "]
    ours = fingerprints(_docs(texts)).to_pandas().sort_values("doc_id")
    for t, got in zip(texts, ours["md5"]):
        ref = duckdb.sql(
            "SELECT md5(lower(regexp_replace(?, '\\s+', ' ', 'g')))", params=[t]
        ).fetchone()[0]
        assert got == ref


def test_embedding_neardup_lsh_equals_brute_force():
    """The banded-LSH rewrite must find EXACTLY the brute-force pair
    set at the oracle threshold (recall 1.0 on this corpus, seeded)."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), 1)
    keep = sims[iu, ju] >= 0.45
    expected = set(zip(ids[iu[keep]], ids[ju[keep]]))

    emb = rd.from_arrow(t)
    out = embedding_neardup(emb, threshold=0.45, dtype=np.float64)
    got = set(map(tuple, out[["vec_a", "vec_b"]].to_numpy()))
    assert got == expected and len(expected) > 0


def test_exact_dedup_has_no_per_group_python():
    """VERDICT round-1: exact_dedup must not use map_groups (one
    Python call per distinct text)."""
    import inspect

    from pgd_ray.text import dedup as dd

    assert "map_groups" not in inspect.getsource(dd.exact_dedup)


def test_ngram_jaccard_pairs_vs_brute_force():
    """ngram_jaccard_pairs must find EXACTLY the brute-force char
    5-gram Jaccard >= threshold pair set (full recall at threshold)."""
    import re

    import pyarrow as pa

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about databases",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "short",
        "x",                                             # shorter than k: padded
    ]
    docs = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))

    def grams(t):
        x = re.sub(r"\s+", " ", t.lower())
        x = x + " " * max(0, 5 - len(x))
        return {x[i:i + 5] for i in range(len(x) - 4)}

    gs = [grams(t) for t in texts]
    expected = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(gs[i] & gs[j])
            uni = len(gs[i] | gs[j])
            jac = inter / uni if uni else 1.0
            if jac >= 0.45:
                expected[(i, j)] = round(jac, 6)

    from pgd_ray.text.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(docs, k=5, threshold=0.45)
    got = {(int(a), int(b)): float(j)
           for a, b, j in out[["doc_a", "doc_b", "jaccard"]].to_numpy()}
    assert got == expected and (0, 3) in expected and (0, 1) in expected


def test_read_documents_format_dispatch(tmp_path):
    """Parquet / CSV / JSONL of the same corpus → identical normalized
    (doc_id, text) tables, so every text stage is format-agnostic."""
    import json

    import pyarrow.parquet as pq

    from pgd_ray.sources.documents import read_documents

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"]).slice(0, 40)
    pq.write_table(src, tmp_path / "docs.parquet")
    src.to_pandas().to_csv(tmp_path / "docs.csv", index=False)
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in src.to_pylist():
            f.write(json.dumps(r) + "\n")

    frames = {}
    for name in ("docs.parquet", "docs.csv", "docs.jsonl"):
        df = read_documents(tmp_path / name).to_pandas()
        assert list(df.columns) == ["doc_id", "text"]
        assert str(df["doc_id"].dtype) == "int64"
        frames[name] = df.sort_values("doc_id", ignore_index=True)
    base = frames["docs.parquet"]
    assert len(base) == 40
    for name, df in frames.items():
        pd.testing.assert_frame_equal(df, base)

    # text stages consume the non-parquet formats unchanged
    out = text_stats(read_documents(tmp_path / "docs.jsonl")).to_pandas()
    assert len(out) == 40 and "token_count" in out.columns

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_documents(tmp_path / "docs.xml")


def test_read_parquet_clean_strips_metadata(tmp_path):
    """read_parquet_clean drops the pandas schema blob at the read
    itself (unhashable schemas otherwise disable Ray's schema-dedup
    fast path and spam warnings), for plain, projected and directory
    inputs alike."""
    import pandas as pd
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]})
    f = tmp_path / "t.parquet"
    df.to_parquet(f)  # attaches the pandas metadata blob
    assert pq.ParquetFile(f).schema_arrow.metadata is not None

    full = read_parquet_clean(str(f)).take_batch(3, batch_format="pyarrow")
    assert full.schema.metadata is None
    assert full.column_names == ["a", "b", "c"]
    hash(full.schema)  # stripped schemas are hashable again

    proj = read_parquet_clean(str(f), columns=["a", "c"]).take_batch(
        3, batch_format="pyarrow"
    )
    assert proj.schema.metadata is None
    assert proj.column_names == ["a", "c"]
    assert proj["a"].to_pylist() == [1, 2, 3]

    d = tmp_path / "dir"
    d.mkdir()
    df.to_parquet(d / "p0.parquet")
    dd = read_parquet_clean(str(d), columns=["b"]).take_batch(3, batch_format="pyarrow")
    assert dd.schema.metadata is None and dd.column_names == ["b"]


def test_clean_corpus_composed_semantics():
    """The composed hygiene pipeline: exact dups collapse to the min
    doc_id, near-dups collapse via the verified-pair components, low
    quality / wrong language rows drop, and empty inputs keep their
    typed schema."""
    import pyarrow as pa
    import ray.data

    from pgd_ray.pipelines.clean_corpus import clean_corpus

    base = ("the cat and the dog are in the house and it is good "
            "for all of that to be here")
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([base, base, base, base + " indeed",
                          "completely different words about that and "
                          "the other things for it to be"], pa.string()),
    }))
    out = clean_corpus(docs, quality_min=0.0)
    assert out["doc_id"].tolist() == [1, 5]  # 2,3 exact dups; 4 near-dup

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    e = clean_corpus(empty)
    assert len(e) == 0
    assert list(e.columns) == ["doc_id", "token_count", "quality"]

    digits = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["123 456", "999"], pa.string())}))
    assert len(clean_corpus(digits)) == 0  # lang 'und' + low quality


def test_minhash_dedup_driver_sees_only_pairs(ray_session, monkeypatch):
    """Scale contract: minhash_lsh_dedup pulls only candidate/verified
    PAIR rows (plus tiny aggregates) to the driver — never the corpus
    doc-id universe or the signature table."""
    import ray.data.dataset as dsmod

    n = 400
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i:03d}x{i * 7 % 97}" for i in range(500)])
    texts = [" ".join(rng.choice(vocab, 12, replace=False)) for _ in range(n)]
    texts[7] = texts[3] + " extra"  # one near-dup pair
    docs = _docs(texts)

    pulled = []
    orig = dsmod.Dataset.iter_internal_ref_bundles

    def counting(self, *a, **kw):
        for bundle in orig(self, *a, **kw):
            rows = bundle.num_rows()
            pulled.append(rows if rows is not None else 0)
            yield bundle

    monkeypatch.setattr(dsmod.Dataset, "iter_internal_ref_bundles", counting)
    out = minhash_lsh_dedup(docs, threshold=0.5)
    assert sum(pulled) < n // 4, pulled  # pairs + aggregates, not the corpus
    monkeypatch.setattr(dsmod.Dataset, "iter_internal_ref_bundles", orig)
    df = out.to_pandas().set_index("doc_id")["dup_group"]
    assert df[7] == df[3] == 3
    assert (df.drop([3, 7]) == df.drop([3, 7]).index).all()


def test_pii_scan_counts_and_redaction():
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.text.pii import pii_scan

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail a.b+c@x-y.org and b@c.io now",
            "call 415-555-0199 or 415-555-0200 from 10.0.0.1",
            "no pii here",
            None,
        ], pa.string()),
    }))
    out = pii_scan(docs).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(out["n_emails"]) == [2, 0, 0, 0]
    assert list(out["n_phones"]) == [0, 2, 0, 0]
    assert list(out["n_ips"]) == [0, 1, 0, 0]
    assert out["clean_text"][0] == "mail [EMAIL] and [EMAIL] now"
    assert out["clean_text"][1] == "call [PHONE] or [PHONE] from [IP]"
    assert out["clean_text"][3] == ""
    # counts-only mode drops the redacted column
    lean = pii_scan(docs, redact=False).to_pandas()
    assert "clean_text" not in lean.columns


def test_chunk_documents_windows_and_validation():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pgd_ray.text.chunking import chunk_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e f g", "x y", ""], pa.string()),
    }))
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    # doc 1: 7 tokens, stride 2 -> ceil(7/2)=4 chunks
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_text"]) == ["a b c d", "c d e f", "e f g", "g"]
    assert list(d1["start_tok"]) == [0, 2, 4, 6]
    assert list(d1["n_tokens"]) == [4, 4, 3, 1]
    # doc 2 fits one chunk; doc 3 empty -> no rows
    assert list(out[out["doc_id"] == 2]["chunk_text"]) == ["x y"]
    assert (out["doc_id"] != 3).all()
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_lang_confusion_mass_conservation():
    import numpy as np

    from pgd_ray.text.analysis import lang_confusion
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    out = lang_confusion(docs)
    # every document lands in exactly one cell
    assert int(out["n"].sum()) == docs.count()
    # the synthetic corpus's lang column need not match its text;
    # assert structure, not accuracy: predictions restricted to the
    # detector's label set, and 'zh' (no stopword profile) never
    # predicted
    assert set(out["lang_pred"]) <= {"de", "en", "es", "fr", "und"}
    assert (out["n"] > 0).all()


def test_hapax_stats_matches_counter():
    import collections
    import re

    import pyarrow.parquet as pq

    from pgd_ray.text.analysis import hapax_stats
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    out = hapax_stats(docs)
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["text"]).to_pandas()
    cnt = collections.Counter()
    for t in ref["text"].fillna(""):
        cnt.update(re.findall(r"[A-Za-z]+", t))
    vocab = len(cnt)
    h1 = sum(1 for v in cnt.values() if v == 1)
    h2 = sum(1 for v in cnt.values() if v == 2)
    assert int(out["vocab_size"].iloc[0]) == vocab
    assert int(out["n_tokens"].iloc[0]) == sum(cnt.values())
    assert int(out["n_hapax"].iloc[0]) == h1
    assert int(out["n_dis"].iloc[0]) == h2
    assert abs(out["hapax_frac"].iloc[0] - round(h1 / vocab, 9)) < 1e-12


def test_lexicon_screen_hand_cases():
    import pandas as pd
    import ray.data

    from pgd_ray.text.analysis import lexicon_screen

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["Buy now FREE prize",          # 4 words, 3 hits
                 "a plain sentence here",       # 0 hits
                 "clicker freebie",             # substrings don't hit
                 ""],
    }))
    out = lexicon_screen(docs, max_frac=0.5).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(out["n_hits"]) == [3, 0, 0, 0]
    assert list(out["n_words"]) == [4, 4, 2, 0]
    assert not out.loc[0, "keep"]          # 0.75 > 0.5
    assert out.loc[1, "keep"] and out.loc[2, "keep"] and out.loc[3, "keep"]


def test_containment_pairs_properties():
    import numpy as np

    from pgd_ray.text.dedup import containment_pairs
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    out = containment_pairs(docs, j_threshold=0.45)
    assert len(out) > 0
    # containment >= jaccard (|A∩B|/|A| >= |A∩B|/|A∪B|), both <= 1
    assert (out["cont_a"] >= out["jaccard"] - 1e-9).all()
    assert (out["cont_b"] >= out["jaccard"] - 1e-9).all()
    assert (out["cont_a"] <= 1 + 1e-9).all()
    assert (out["cont_b"] <= 1 + 1e-9).all()
    # harmonic identity: 1/J = 1/Ca + 1/Cb - 1
    inv = 1 / out["cont_a"] + 1 / out["cont_b"] - 1
    assert np.allclose(1 / out["jaccard"], inv, rtol=1e-3)


def test_vocab_coverage_matches_counter():
    import collections
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.text.analysis import vocab_coverage
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    out = vocab_coverage(docs, ks=(10, 100, 1000))
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["text"]).to_pandas()
    cnt = collections.Counter()
    for t in ref["text"].fillna(""):
        cnt.update(re.findall(r"[A-Za-z]+", t))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for i, k in enumerate((10, 100, 1000)):
        top = sum(c for _, c in ranked[:k])
        r = out.iloc[i]
        assert int(r["covered"]) == top
        assert int(r["total"]) == total
        assert abs(r["coverage"] - round(top / total, 9)) < 1e-12
    # monotone nondecreasing coverage
    assert out["coverage"].is_monotonic_increasing


def test_term_dispersion_matches_counter():
    import collections
    import re

    import pyarrow.parquet as pq

    from pgd_ray.text.analysis import term_dispersion
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    out = term_dispersion(docs, n=20)
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["text"]).to_pandas()
    cf = collections.Counter()
    df = collections.Counter()
    for t in ref["text"].fillna(""):
        toks = re.findall(r"[A-Za-z]+", t)
        cf.update(toks)
        df.update(set(toks))
    for r in out.itertuples(index=False):
        assert cf[r.token] == r.cf
        assert df[r.token] == r.df
        assert abs(r.burstiness - round(r.cf / r.df, 6)) < 1e-12
    # burstiness >= 1 always (cf >= df)
    assert (out["burstiness"] >= 1).all()


def test_source_dup_rate_matches_pandas():
    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.text.dedup import source_dup_rate
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["source", "text"])
    out = source_dup_rate(docs).set_index("source")
    ref = pq.read_table(f"{SF}/documents.parquet",
                        columns=["source", "text"]).to_pandas()
    for src, g in ref.groupby("source"):
        assert int(out.loc[src, "n_docs"]) == len(g)
        assert int(out.loc[src, "n_distinct"]) == g["text"].nunique()
    assert out["dup_frac"].between(0, 1).all()


def test_clean_corpus_ascii_token_contract_non_ascii_text():
    """Regression (VERDICT r3 latent c): token_count must use re.ASCII
    so \\w matches DuckDB's RE2 ASCII \\w byte-for-byte on non-ASCII
    text — 'café über naïve' must count the accented letters as
    punctuation-class, identically in engine and SQL."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.pipelines.clean_corpus import clean_corpus

    texts = [
        "café über naïve résumé — déjà vu søster",
        "日本語のテキストです。トークン化はどうなる?",
        "plain ascii words only here, twelve of them exactly now yes",
        "mixed: caffè + latte = ☕ (2 shots), 100% arabica!",
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "text": texts}))
    out = clean_corpus(docs, quality_min=0.0, lang="en")
    got = dict(zip(out["doc_id"], out["token_count"]))
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            r"SELECT len(regexp_extract_all(?, '\w+|[^\w\s]'))", [t]
        ).fetchone()[0]
        if i in got:  # lang filter may drop non-en docs; check the kept
            assert got[i] == want, (i, got[i], want)
    # the pure-ascii english doc must survive and match
    assert 2 in got


def test_pack_assignments_rejects_duplicate_doc_ids():
    """Regression (VERDICT r3 latent d): per-block offsets are keyed by
    min doc_id, so duplicate doc_ids straddling a block boundary would
    silently corrupt start_tok — the contract is an explicit error."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pgd_ray.text.packing import pack_assignments

    ids = np.array([1, 2, 2, 3], dtype=np.int64)
    docs = rd.from_arrow(pa.table({
        "doc_id": ids, "text": ["a b", "c d", "e f", "g h"]}))
    with pytest.raises(ValueError, match="unique"):
        pack_assignments(docs.repartition(4), pack_len=8).to_pandas()


def test_containment_pairs_ds_never_collects_pairs(monkeypatch):
    """Round-4 scale contract (VERDICT r3): containment_pairs_ds keeps
    the verified pairs a Dataset end to end — the only driver pulls
    are participant-bounded (ids + sizes), never ∝ pair count.  A
    40-doc duplicate clique makes pairs (780) ≫ participants (40);
    every frame the driver pulls must stay ≤ participants."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import ray.data.dataset as dsmod

    from pgd_ray.text.dedup import containment_pairs_ds

    n = 40
    texts = ["the quick brown fox jumps over the lazy dog " * 4] * n + \
            [f"unique filler document number {i} with its own words {i}"
             for i in range(25)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts})).repartition(6)

    pulled = []
    orig = dsmod.Dataset.to_pandas

    def counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        pulled.append(len(out))
        return out

    monkeypatch.setattr(dsmod.Dataset, "to_pandas", counting)
    out = containment_pairs_ds(docs, j_threshold=0.5)
    assert isinstance(out, rd.Dataset)
    df = orig(out)  # consume OUTSIDE the counted window
    monkeypatch.undo()
    assert len(df) >= n * (n - 1) // 2  # the clique's pairs are all there
    clique = df[(df["doc_a"] < n) & (df["doc_b"] < n)]
    assert (clique["cont_a"] == 1.0).all()  # identical docs: full containment
    # pulls: the participant-size table (65) and the O(#blocks)
    # LSH boundary-bucket stitch (80 here) — both far under the pair
    # count (1080+); a full-pair collect would blow this bound
    assert pulled and max(pulled) <= 3 * (n + 25), pulled


def test_simhash_pairs_ds_never_collects_pairs(monkeypatch):
    """Round-5 scale contract (VERDICT r4 item 1): simhash_pairs_ds
    keeps candidate pairs a Dataset end to end — the only driver pull
    is the O(#blocks) boundary-bucket stitch, never ∝ pair count.  A
    45-doc near-identical clique makes pairs (990) ≫ the stitch."""
    import ray.data.dataset as dsmod

    from pgd_ray.text.dedup import simhash_pairs_ds

    n = 45
    texts = ["the quick brown fox jumps over the lazy dog " * 6] * n + \
            [f"entirely different filler text number {i} oddball {i}"
             for i in range(20)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts})).repartition(6)

    pulled = []
    orig = dsmod.Dataset.to_pandas

    def counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        pulled.append(len(out))
        return out

    monkeypatch.setattr(dsmod.Dataset, "to_pandas", counting)
    out = simhash_pairs_ds(docs, max_hamming=3)
    assert isinstance(out, rd.Dataset)
    df = orig(out)  # consume OUTSIDE the counted window
    monkeypatch.undo()
    clique = df[(df["doc_a"] < n) & (df["doc_b"] < n)]
    assert len(clique) == n * (n - 1) // 2  # identical docs: hamming 0
    assert (clique["hamming"] == 0).all()
    # driver pulls: only boundary-bucket rows (≤ 2 buckets/block over
    # 4 bands); a full-pair collect (990+) would blow this bound
    assert max(pulled, default=0) <= 4 * (n + 20), pulled


def test_embedding_neardup_ds_never_collects_pairs(monkeypatch):
    """Round-5 scale contract (VERDICT r4 item 2): embedding_neardup_ds
    keeps candidate pairs a Dataset end to end; driver pulls stay
    O(#blocks) boundary rows, never ∝ pair count."""
    import ray.data.dataset as dsmod

    from pgd_ray.text.dedup import embedding_neardup_ds

    rng = np.random.default_rng(17)
    n, extra, dim = 40, 25, 16
    base = rng.standard_normal(dim)
    vecs = [base + rng.standard_normal(dim) * 1e-4 for _ in range(n)] + \
           [rng.standard_normal(dim) for _ in range(extra)]
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n + extra), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))})).repartition(6)

    pulled = []
    orig = dsmod.Dataset.to_pandas

    def counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        pulled.append(len(out))
        return out

    monkeypatch.setattr(dsmod.Dataset, "to_pandas", counting)
    out = embedding_neardup_ds(emb, threshold=0.95, dtype=np.float64)
    assert isinstance(out, rd.Dataset)
    df = orig(out)
    monkeypatch.undo()
    clique = df[(df["vec_a"] < n) & (df["vec_b"] < n)]
    assert len(clique) == n * (n - 1) // 2  # near-identical vectors
    assert (clique["cosine"] >= 0.95).all()
    assert max(pulled, default=0) <= 4 * (n + extra), pulled
