import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.text.segdedup import (
    dedup_segments,
    explode_segments,
    rebuild_docs,
    segment_dedup_docs,
)


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _ref(texts, w):
    """Pure-python replay: aligned w-word segments, first-occurrence
    keep in (doc_id, seg_idx) order, rebuilt docs."""
    seen = {}
    for did, txt in enumerate(texts):
        words = txt.strip().split(" ")
        for i in range((len(words) + w - 1) // w):
            s = " ".join(words[i * w:(i + 1) * w])
            if s and s not in seen:
                seen[s] = (did, i)
    out = {}
    for s, (did, i) in seen.items():
        out.setdefault(did, []).append((i, s))
    return {
        did: (" ".join(s for _, s in sorted(v)), len(v))
        for did, v in out.items()
    }


def test_explode_positions_and_empty_doc():
    t = explode_segments(_docs(["a b c d e", "", "  "]), seg_words=2).take_all()
    segs = {(r["pos"] >> 20, r["pos"] & 0xFFFFF): r["seg"] for r in t}
    assert segs == {(0, 0): "a b", (0, 1): "c d", (0, 2): "e"}


def test_first_occurrence_wins():
    texts = ["x y z w q r", "x y z w a b", "q r a b x y"]
    surv = dedup_segments(_docs(texts), seg_words=2).take_all()
    got = {(r["doc_id"], r["seg_idx"]): r["seg"] for r in surv}
    # "x y","z w" first in doc0; "q r" doc0; "a b" first in doc1
    assert got == {(0, 0): "x y", (0, 1): "z w", (0, 2): "q r", (1, 2): "a b"}


def test_end_to_end_matches_reference():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(40)]
    out = segment_dedup_docs(_docs(texts), seg_words=4).take_all()
    got = {r["doc_id"]: (r["text_dedup"], r["n_segs"]) for r in out}
    assert got == _ref(texts, 4)


def test_rebuild_stitches_across_blocks():
    # one long doc split across many 1-row blocks: every row is a
    # boundary row, the driver stitch must reassemble in seg order
    surv = rd.from_arrow(pa.table({
        "doc_id": pa.array([7] * 6 + [8], pa.int64()),
        "seg_idx": pa.array([5, 3, 1, 0, 2, 4, 0], pa.int64()),
        "seg": pa.array([f"s{i}" for i in (5, 3, 1, 0, 2, 4)] + ["t0"],
                        pa.string()),
    })).repartition(7)
    out = {r["doc_id"]: r for r in rebuild_docs(surv).take_all()}
    assert out[7]["text_dedup"] == "s0 s1 s2 s3 s4 s5"
    assert out[7]["n_segs"] == 6 and out[8]["text_dedup"] == "t0"
