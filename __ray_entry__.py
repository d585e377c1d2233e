"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (transcripts → edge table →
CSR → PageRank + CC + graphlet counts) on sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2; and
``oracle_sql()`` provides the DuckDB-equivalent SQL for every
SQL-expressible query — including the iterative engines (PageRank /
k-core / label propagation as recursive CTEs with aggregation in the
recursive term), the language heuristic, the univariate stats, a
bit-exact splitmix64 SimHash mirror, MinHash dup groups as recursive
connected components of the exact-Jaccard pair graph, and the composed
clean_corpus hygiene pipeline end-to-end, and the sampled graphlet
estimator (content-hash sampling → bit-reproducible in SQL).  Every
query key has an oracle entry.

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init`` / ``ray.shutdown`` anywhere below.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

SF_SMOKE = "/root/testdata/sf0.001"


def _read(path: str, columns=None):
    """read_parquet with the file schema pre-stripped of the pandas
    metadata blob (unhashable schemas spam every downstream task with
    warnings and skip Ray's schema-dedup fast path)."""
    from pgd_ray.util import read_parquet_clean

    return read_parquet_clean(path, columns=columns)


# ---------------------------------------------------------------------------
# shared SQL fragments (mirror pgd_ray.sources 1:1)
# ---------------------------------------------------------------------------

# event-time midpoint split — mirrors __ray_entry__._event_halves
_EV_MID_CTE = """b AS (
  SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid
  FROM events)"""

# (user_id, props.k, epoch µs) pair stream — same extraction contract
_EV_PAIR_CTE = """pr AS (
  SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         epoch_us(ts) AS tu
  FROM events)"""

# transcripts derived from events — pgd_ray.sources.transcripts.derive_transcripts
_T_CTE = """
t AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         CASE CAST(event_id % 3 AS INTEGER) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         props AS text,
         event_type AS tool,
         ts
  FROM events)
"""

# tool-transition edges — pgd_ray.sources.edges.edges_from_transcripts
_TE_CTE = (
    _T_CTE
    + """,
vocab AS (SELECT tool, CAST(row_number() OVER (ORDER BY tool) - 1 AS BIGINT) AS tid
          FROM (SELECT DISTINCT tool FROM t)),
pairs AS (SELECT a.tool AS ta, b.tool AS tb
          FROM t a JOIN t b ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1),
e AS (SELECT DISTINCT least(va.tid, vb.tid) AS src, greatest(va.tid, vb.tid) AS dst
      FROM pairs JOIN vocab va ON pairs.ta = va.tool JOIN vocab vb ON pairs.tb = vb.tool
      WHERE va.tid <> vb.tid)
"""
)

# 20-round label propagation over the tool graph (mode of neighbor
# labels, ties -> smallest) ending in lab(v, label) — shared by the
# conductance oracle; label_prop_tool / modularity_tool inline the
# same chain.
_LP_CTE = """
vtx AS (SELECT tid AS v FROM vocab),
lp(it, v, label) AS (
  SELECT 0, v, v FROM vtx
  UNION ALL
  SELECT it+1, v, new_label FROM (
    SELECT lp.it AS it, lp.v AS v, COALESCE(m.nl, lp.label) AS new_label
    FROM lp LEFT JOIN (
      SELECT s.src AS mv, lp2.label AS nl
      FROM s JOIN lp lp2 ON lp2.v = s.dst
      GROUP BY s.src, lp2.label
      QUALIFY row_number() OVER (PARTITION BY s.src
                                 ORDER BY COUNT(*) DESC, lp2.label ASC) = 1
    ) m ON m.mv = lp.v
  ) WHERE it < 20),
lab AS (SELECT v, CAST(label AS BIGINT) AS label FROM lp WHERE it = 20)
"""

# bipartite user x event_type incidence + HITS authority iteration —
# pgd_ray.graph.bipartite (M = B^T B gram matrix, 32 power rounds)
_BIP_CTE = """
p AS (SELECT DISTINCT user_id, event_type FROM events),
m AS (SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM p a JOIN p b ON a.user_id = b.user_id GROUP BY 1, 2),
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t
       FROM (SELECT DISTINCT event_type FROM p)),
av(it, et, a) AS (
  SELECT 0, event_type, 1.0/sqrt((SELECT t FROM tt))
  FROM (SELECT DISTINCT event_type FROM p)
  UNION ALL
  SELECT it, et, raw / sqrt(SUM(raw*raw) OVER ()) FROM (
    SELECT av.it+1 AS it, m.ta AS et, SUM(m.c * av.a) AS raw
    FROM av JOIN m ON m.tb = av.et
    WHERE av.it < 32 GROUP BY av.it+1, m.ta) q)
"""

# co-purchase edges — pgd_ray.sources.edges.edges_copurchase
_E_CTE = """
e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""

_S_CTE = """
s AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
"""

_D_CTE = """
d AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS degree FROM s GROUP BY src)
"""

# Streaming-form per-vertex triangle counts (round 5, VERDICT r4 item
# 5): the old mirrors joined every edge against the full adjacency
# (`e × s`, Σdeg-per-edge intermediate) which OOMed DuckDB at sf0.1.
# This is the degree-oriented wedge join instead — orient each edge
# from the lower-(degree, id) endpoint, enumerate each triangle
# exactly once at its minimum-rank vertex (two oriented out-edges +
# one undirected closure probe against canonical `e`), then count
# triangle incidences per vertex.  The intermediate is the oriented
# wedge set, O(m^1.5) worst case, streamable.  Requires e/s/d CTEs.
_VT_STREAM_CTE = """
oe AS (SELECT CASE WHEN da.degree < db.degree
                     OR (da.degree = db.degree AND e.src < e.dst)
                   THEN e.src ELSE e.dst END AS u,
              CASE WHEN da.degree < db.degree
                     OR (da.degree = db.degree AND e.src < e.dst)
                   THEN e.dst ELSE e.src END AS w
       FROM e JOIN d da ON da.v = e.src JOIN d db ON db.v = e.dst),
tr AS (SELECT e1.u AS a, e1.w AS b, e2.w AS c
       FROM oe e1 JOIN oe e2 ON e1.u = e2.u AND e1.w < e2.w
            JOIN e e3 ON e3.src = LEAST(e1.w, e2.w)
                     AND e3.dst = GREATEST(e1.w, e2.w)),
tv AS (SELECT a AS v FROM tr UNION ALL SELECT b FROM tr
       UNION ALL SELECT c FROM tr),
vt AS (SELECT d.v, CAST(COALESCE(t.tri, 0) AS BIGINT) AS tri
       FROM d LEFT JOIN (SELECT v, COUNT(*) AS tri FROM tv GROUP BY v) t
            ON t.v = d.v)
"""


def _macro17_sql(edge_cte: str, n_expr: str) -> str:
    """Full 17-count graphlet SQL over a (small) edge CTE ``e`` —
    per-edge tri / 4-clique-pair / induced-4-cycle-pair counts via
    correlated subqueries, then the identical closed-form closure as
    pgd_ray.graph.graphlets.macro_from_partials."""
    return f"""
WITH {edge_cte},
{_S_CTE},
{_D_CTE},
nn AS (SELECT CAST({n_expr} AS BIGINT) AS n),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
pe AS (
  SELECT e.src, e.dst, d1.degree AS dv, d2.degree AS du,
    (SELECT COUNT(*) FROM s s1 JOIN s s2 ON s1.dst = s2.dst
      WHERE s1.src = e.src AND s2.src = e.dst) AS tri,
    (SELECT COUNT(*) FROM e wx
      WHERE EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.dst)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.dst)) AS clq,
    (SELECT COUNT(*) FROM s w_adj, s x_adj, s wx
      WHERE w_adj.src = e.dst AND w_adj.dst <> e.src
        AND w_adj.dst NOT IN (SELECT s2.dst FROM s s2 WHERE s2.src = e.src)
        AND x_adj.src = e.src AND x_adj.dst <> e.dst
        AND x_adj.dst NOT IN (SELECT s3.dst FROM s s3 WHERE s3.src = e.dst)
        AND wx.src = w_adj.dst AND wx.dst = x_adj.dst) AS cyc
  FROM e JOIN d d1 ON d1.v = e.src JOIN d d2 ON d2.v = e.dst),
pe2 AS (
  SELECT *, dv - tri - 1 AS wv, du - tri - 1 AS wu,
         (dv - tri - 1) + (du - tri - 1) AS s3,
         (dv - tri - 1) + (du - tri - 1) + tri + 2 AS un
  FROM pe),
agg AS (
  SELECT CAST(COALESCE(SUM(tri),0) AS BIGINT) AS stri,
         CAST(COALESCE(SUM(s3),0) AS BIGINT) AS sstar3,
         CAST(COALESCE(SUM(clq),0) AS BIGINT) AS sclq,
         CAST(COALESCE(SUM(cyc),0) AS BIGINT) AS scyc,
         CAST(COALESCE(SUM((tri+s3)*(tri+s3-1)//2),0) AS BIGINT) AS n1,
         CAST(COALESCE(SUM(tri*(tri-1)//2),0) AS BIGINT) AS n3,
         CAST(COALESCE(SUM(tri*s3),0) AS BIGINT) AS n4,
         CAST(COALESCE(SUM(wv*wu),0) AS BIGINT) AS n5,
         CAST(COALESCE(SUM(wv*(wv-1)//2 + wu*(wu-1)//2),0) AS BIGINT) AS n6,
         CAST(COALESCE(SUM((SELECT m FROM mm) - dv - du + 1),0) AS BIGINT) AS n7,
         CAST(COALESCE(SUM(((SELECT n FROM nn)-un)*(((SELECT n FROM nn)-un)-1)//2),0) AS BIGINT) AS n8,
         CAST(COALESCE(SUM(s3*((SELECT n FROM nn)-un)),0) AS BIGINT) AS n9,
         CAST(COALESCE(SUM(tri*((SELECT n FROM nn)-un)),0) AS BIGINT) AS n10,
         CAST(COALESCE(SUM((SELECT n FROM nn)-un),0) AS BIGINT) AS s31
  FROM pe2),
cl AS (
  SELECT (SELECT n FROM nn) AS n, (SELECT m FROM mm) AS m, a.*,
         a.stri // 3 AS tris, a.sstar3 // 2 AS star2,
         a.sclq // 6 AS clique, a.scyc // 4 AS cycle
  FROM agg a),
cl2 AS (
  SELECT *, n3 - 6*clique AS chord, n5 - 4*cycle AS path,
         (n4 - 4*(n3 - 6*clique)) // 2 AS tailed
  FROM cl),
cl3 AS (
  SELECT *,
    (n6 - tailed) // 3 AS star3t,
    (n7 - 6*clique - 4*cycle - 4*chord - 2*path - 2*tailed) // 2 AS e2
  FROM cl2)
SELECT
  CAST(m AS BIGINT) AS total_2_1edge,
  CAST(n*(n-1)//2 - m AS BIGINT) AS total_2_indep,
  CAST(tris AS BIGINT) AS total_3_tris,
  CAST(star2 AS BIGINT) AS total_2_star,
  CAST(s31 AS BIGINT) AS total_3_1edge,
  CAST(n*(n-1)*(n-2)//6 - (tris + star2 + s31) AS BIGINT) AS total_3_indep,
  CAST(clique AS BIGINT) AS total_4_clique,
  CAST(chord AS BIGINT) AS total_4_chordcycle,
  CAST(tailed AS BIGINT) AS total_4_tailed_tris,
  CAST(cycle AS BIGINT) AS total_4_cycle,
  CAST(star3t AS BIGINT) AS total_3_star,
  CAST(path AS BIGINT) AS total_4_path,
  CAST(n8 - 2*e2 AS BIGINT) AS total_4_1edge,
  CAST(e2 AS BIGINT) AS total_4_2edge,
  CAST((n9 - 2*path) // 2 AS BIGINT) AS total_4_2star,
  CAST((n10 - tailed) // 3 AS BIGINT) AS total_4_tri,
  CAST(n*(n-1)*(n-2)*(n-3)//24
       - (clique + chord + tailed + cycle + star3t + path
          + (n8 - 2*e2) + e2 + (n9 - 2*path)//2 + (n10 - tailed)//3)
       AS BIGINT) AS total_4_indep
FROM cl3
"""


_M64 = 1 << 64
_M32 = 1 << 32


def _mulmod_sql(x: str, k: int) -> str:
    """``x * k mod 2^64`` in HUGEINT-safe SQL (split k into 32-bit halves
    so no intermediate product exceeds HUGEINT range)."""
    k_hi, k_lo = k >> 32, k & (_M32 - 1)
    return (f"((((({x}) // {_M32}) * {k_lo} + (({x}) % {_M32}) * {k_hi}) % {_M32}) * {_M32}"
            f" + (({x}) % {_M32}) * {k_lo}) % {_M64}")


def _splitmix_sql(raw: str, ln: str) -> str:
    """splitmix64(raw ^ ln) as SQL — the exact finalizer used by
    pgd_ray.text.hashing (xor-shift / multiply constants identical)."""

    def u(x):
        return f"CAST(({x}) AS UBIGINT)"

    def h(x):
        return f"CAST(({x}) AS HUGEINT)"

    x0 = f"xor({u(raw)}, {u(ln)})"
    x1 = u(f"(({h(x0)}) + {0x9E3779B97F4A7C15}) % {_M64}")
    x2 = f"(SELECT xor(a, a >> 30) FROM (SELECT {x1} AS a))"
    x3 = u(_mulmod_sql(h(x2), 0xBF58476D1CE4E5B9))
    x4 = f"(SELECT xor(a, a >> 27) FROM (SELECT {x3} AS a))"
    x5 = u(_mulmod_sql(h(x4), 0x94D049BB133111EB))
    return f"(SELECT xor(a, a >> 31) FROM (SELECT {x5} AS a))"


def _msf_sql(rounds: int = 16) -> str:
    """Unrolled-Borůvka maximum-spanning-forest SQL over the basket
    co-occurrence graph: per round every component nominates its best
    cut edge under the strict key (w DESC, a, b) — unique per edge, so
    the forest is unique and must equal graph.mst.boruvka_forest's —
    then contracts via a small recursive closure over the merge graph
    (component nodes only, never vertex-squared).  Components at least
    halve per round: 16 rounds cover n <= 65536 parts; converged
    rounds self-copy (empty picks).  MATERIALIZED keeps DuckDB from
    re-expanding the lineitem scan once per round."""
    parts = [
        """ew AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(COUNT(*) AS BIGINT) AS w
  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)""",
        "vv AS (SELECT DISTINCT x AS v FROM (SELECT a AS x FROM ew UNION ALL SELECT b FROM ew))",
        "cc0 AS (SELECT v, v AS c FROM vv)",
        "ac0(a, b, w) AS (SELECT a, b, w FROM ew WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""og{i} AS MATERIALIZED (
  SELECT ca.c AS c, ew.a, ew.b, ew.w
  FROM ew JOIN cc{p} ca ON ca.v = ew.a JOIN cc{p} cb ON cb.v = ew.b AND cb.c <> ca.c
  UNION ALL
  SELECT cb.c, ew.a, ew.b, ew.w
  FROM ew JOIN cc{p} ca ON ca.v = ew.a JOIN cc{p} cb ON cb.v = ew.b AND cb.c <> ca.c)""")
        parts.append(f"""pk{i} AS (
  SELECT a, b, w FROM (
    SELECT c, a, b, w, row_number() OVER (PARTITION BY c ORDER BY w DESC, a, b) AS rn
    FROM og{i}) WHERE rn = 1)""")
        parts.append(
            f"ac{i} AS MATERIALIZED (SELECT * FROM ac{p} UNION SELECT DISTINCT a, b, w FROM pk{i})")
        parts.append(f"""mg{i} AS (
  SELECT ca.c AS x, cb.c AS y
  FROM pk{i} k JOIN cc{p} ca ON ca.v = k.a JOIN cc{p} cb ON cb.v = k.b
  UNION
  SELECT cb.c, ca.c
  FROM pk{i} k JOIN cc{p} ca ON ca.v = k.a JOIN cc{p} cb ON cb.v = k.b)""")
        parts.append(f"""wk{i}(v, l) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM mg{i})
  UNION
  SELECT mg{i}.y, wk{i}.l FROM wk{i} JOIN mg{i} ON mg{i}.x = wk{i}.v)""")
        parts.append(f"nl{i} AS (SELECT v AS c, MIN(l) AS l FROM wk{i} GROUP BY v)")
        parts.append(f"""cc{i} AS MATERIALIZED (
  SELECT cc{p}.v, COALESCE(nl{i}.l, cc{p}.c) AS c
  FROM cc{p} LEFT JOIN nl{i} ON nl{i}.c = cc{p}.c)""")
    body = ",\n".join(parts)
    return f"""WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
{body}
SELECT a AS part_a, b AS part_b, w FROM ac{rounds} ORDER BY part_a, part_b"""


def _fdiv_sql(a: str, b: str) -> str:
    """Python floor-division semantics in SQL for positive divisors
    (DuckDB's ``//`` truncates toward zero; the engine's closure uses
    Python ``//`` which floors — they differ on the negative
    intermediates a noisy sampled estimate can produce)."""
    return (f"CASE WHEN ({a}) >= 0 THEN ({a}) // ({b})"
            f" ELSE -((-({a}) + ({b}) - 1) // ({b})) END")


def _edgemix_sql(seed: int) -> str:
    """The engine's content-hash edge sampler as SQL: splitmix64-style
    mix of (src*A + dst*B + seed) — identical constants and shift
    chain to graphlets.graphlet_macro_approx, so the sampled edge set
    matches bit-for-bit."""
    A_, B_, C3_ = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def u(x):
        return f"CAST(({x}) AS UBIGINT)"

    def h(x):
        return f"CAST(({x}) AS HUGEINT)"

    x0 = f"({_mulmod_sql(h('src'), A_)} + {_mulmod_sql(h('dst'), B_)} + {seed}) % {_M64}"
    x2 = f"(SELECT xor(a, a >> 30) FROM (SELECT {u(x0)} AS a))"
    x4 = f"(SELECT xor(a, a >> 27) FROM (SELECT {u(_mulmod_sql(h(x2), B_))} AS a))"
    x6 = f"(SELECT xor(a, a >> 31) FROM (SELECT {u(_mulmod_sql(h(x4), C3_))} AS a))"
    return h(x6)


def _macro17_approx_sql(edge_cte: str, n_expr: str,
                        fraction: float = 0.1, seed: int = 42) -> str:
    """Sampled-estimator mirror of ``_macro17_sql``: per-edge equation
    terms are computed against the FULL graph but summed only over the
    content-hash p-sample (same hash+threshold as the engine), scaled
    by 1/p, then pushed through the identical closure — bit-exact vs
    ``graphlets.graphlet_macro_approx``."""
    thresh = int(fraction * 2.0**64)
    sc = round(1.0 / fraction)
    fdiv = _fdiv_sql
    return f"""
WITH {edge_cte},
{_S_CTE},
{_D_CTE},
nn AS (SELECT CAST({n_expr} AS BIGINT) AS n),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
es AS (SELECT src, dst FROM e WHERE {_edgemix_sql(seed)} < {thresh}),
pe AS (
  SELECT es.src, es.dst, d1.degree AS dv, d2.degree AS du,
    (SELECT COUNT(*) FROM s s1 JOIN s s2 ON s1.dst = s2.dst
      WHERE s1.src = es.src AND s2.src = es.dst) AS tri,
    (SELECT COUNT(*) FROM e wx
      WHERE EXISTS (SELECT 1 FROM s WHERE s.src = es.src AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = es.src AND s.dst = wx.dst)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = es.dst AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = es.dst AND s.dst = wx.dst)) AS clq,
    (SELECT COUNT(*) FROM s w_adj, s x_adj, s wx
      WHERE w_adj.src = es.dst AND w_adj.dst <> es.src
        AND w_adj.dst NOT IN (SELECT s2.dst FROM s s2 WHERE s2.src = es.src)
        AND x_adj.src = es.src AND x_adj.dst <> es.dst
        AND x_adj.dst NOT IN (SELECT s3.dst FROM s s3 WHERE s3.src = es.dst)
        AND wx.src = w_adj.dst AND wx.dst = x_adj.dst) AS cyc
  FROM es JOIN d d1 ON d1.v = es.src JOIN d d2 ON d2.v = es.dst),
pe2 AS (
  SELECT *, dv - tri - 1 AS wv, du - tri - 1 AS wu,
         (dv - tri - 1) + (du - tri - 1) AS s3,
         (dv - tri - 1) + (du - tri - 1) + tri + 2 AS un
  FROM pe),
agg AS (
  SELECT CAST({sc}*COUNT(*) AS BIGINT) AS cnt,
         CAST({sc}*COALESCE(SUM(tri),0) AS BIGINT) AS stri,
         CAST({sc}*COALESCE(SUM(s3),0) AS BIGINT) AS sstar3,
         CAST({sc}*COALESCE(SUM(clq),0) AS BIGINT) AS sclq,
         CAST({sc}*COALESCE(SUM(cyc),0) AS BIGINT) AS scyc,
         CAST({sc}*COALESCE(SUM(tri*(tri-1)//2),0) AS BIGINT) AS n3,
         CAST({sc}*COALESCE(SUM(tri*s3),0) AS BIGINT) AS n4,
         CAST({sc}*COALESCE(SUM(wv*wu),0) AS BIGINT) AS n5,
         CAST({sc}*COALESCE(SUM(wv*(wv-1)//2 + wu*(wu-1)//2),0) AS BIGINT) AS n6,
         CAST({sc}*COALESCE(SUM(dv+du),0) AS BIGINT) AS sdvdu,
         CAST({sc}*COALESCE(SUM(un),0) AS BIGINT) AS ss,
         CAST({sc}*COALESCE(SUM(un*un),0) AS BIGINT) AS ss2,
         CAST({sc}*COALESCE(SUM(s3*un),0) AS BIGINT) AS sstar3s,
         CAST({sc}*COALESCE(SUM(tri*un),0) AS BIGINT) AS stris
  FROM pe2),
cl AS (
  SELECT (SELECT n FROM nn) AS n, (SELECT m FROM mm) AS m, a.*,
         a.cnt*((SELECT m FROM mm)+1) - a.sdvdu AS n7,
         a.cnt*((SELECT n FROM nn)*((SELECT n FROM nn)-1)//2)
           - (SELECT n FROM nn)*a.ss + (a.ss2 + a.ss)//2 AS n8,
         (SELECT n FROM nn)*a.sstar3 - a.sstar3s AS n9,
         (SELECT n FROM nn)*a.stri - a.stris AS n10,
         a.cnt*(SELECT n FROM nn) - a.ss AS s31,
         {fdiv('a.stri','3')} AS tris, {fdiv('a.sstar3','2')} AS star2,
         {fdiv('a.sclq','6')} AS clique, {fdiv('a.scyc','4')} AS cycle
  FROM agg a),
cl2 AS (
  SELECT *, n3 - 6*clique AS chord, n5 - 4*cycle AS path,
         {fdiv('n4 - 4*(n3 - 6*clique)','2')} AS tailed
  FROM cl),
cl3 AS (
  SELECT *,
    {fdiv('n6 - tailed','3')} AS star3t,
    {fdiv('n7 - 6*clique - 4*cycle - 4*chord - 2*path - 2*tailed','2')} AS e2
  FROM cl2)
SELECT
  CAST(m AS BIGINT) AS total_2_1edge,
  CAST(n*(n-1)//2 - m AS BIGINT) AS total_2_indep,
  CAST(tris AS BIGINT) AS total_3_tris,
  CAST(star2 AS BIGINT) AS total_2_star,
  CAST(s31 AS BIGINT) AS total_3_1edge,
  CAST(n*(n-1)*(n-2)//6 - (tris + star2 + s31) AS BIGINT) AS total_3_indep,
  CAST(clique AS BIGINT) AS total_4_clique,
  CAST(chord AS BIGINT) AS total_4_chordcycle,
  CAST(tailed AS BIGINT) AS total_4_tailed_tris,
  CAST(cycle AS BIGINT) AS total_4_cycle,
  CAST(star3t AS BIGINT) AS total_3_star,
  CAST(path AS BIGINT) AS total_4_path,
  CAST(n8 - 2*e2 AS BIGINT) AS total_4_1edge,
  CAST(e2 AS BIGINT) AS total_4_2edge,
  CAST({fdiv('n9 - 2*path','2')} AS BIGINT) AS total_4_2star,
  CAST({fdiv('n10 - tailed','3')} AS BIGINT) AS total_4_tri,
  CAST(n*(n-1)*(n-2)*(n-3)//24
       - (clique + chord + tailed + cycle + star3t + path
          + (n8 - 2*e2) + e2 + ({fdiv('n9 - 2*path','2')}) + ({fdiv('n10 - tailed','3')}))
       AS BIGINT) AS total_4_indep
FROM cl3
"""


def _simhash_pairs_sql(docs_rel: str = "documents") -> str:
    """Bit-exact SQL mirror of ``pgd_ray.text.dedup.simhash_dedup``:
    per-token FNV-prime polynomial hash + splitmix64 finalizer (the
    engine's ``_stable_hash64``), 64-bit majority-vote signature, then
    ALL pairs at hamming <= 3.  The engine's 4x16-bit band blocking has
    guaranteed recall at hamming <= 3 (pigeonhole), so uncapped
    all-pairs SQL is semantically identical; verified bit-for-bit on
    sf0.001/sf0.01/sf0.1 signatures and pair sets."""
    sm = _splitmix_sql("raw", "CAST(L AS HUGEINT)")
    return f"""
WITH RECURSIVE
pw(i, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i + 1, (p * {0x100000001B3}) % {_M64} FROM pw WHERE i < 255),
tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                                    x -> len(x) > 0)) AS tok
  FROM {docs_rel}),
toks_d AS (SELECT DISTINCT tok FROM tok),
bytes AS (
  SELECT tok, unnest(generate_series(1, length(tok))) AS i FROM toks_d),
raws AS (
  SELECT b.tok,
         SUM(CAST(ord(substr(b.tok, b.i, 1)) AS HUGEINT) * pw.p) % {_M64} AS raw,
         length(b.tok) AS L
  FROM bytes b JOIN pw ON pw.i = b.i - 1
  GROUP BY b.tok),
uh AS (SELECT tok, {sm} AS h FROM raws),
bitsums AS (
  SELECT t.doc_id, g.bit,
         SUM(CAST((uh.h >> g.bit) & 1 AS BIGINT)) AS ones,
         COUNT(*) AS total
  FROM tok t JOIN uh USING (tok)
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) g
  GROUP BY t.doc_id, g.bit),
sig0 AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * ones >= total
                  THEN (CAST(1 AS HUGEINT) * (CAST(1 AS UBIGINT) << bit))
                  ELSE 0 END) % {_M64} AS packed
  FROM bitsums GROUP BY doc_id),
sig AS (
  SELECT d.doc_id,
         CAST(CASE WHEN COALESCE(s.packed, 0) >= {1 << 63}
                   THEN COALESCE(s.packed, 0) - {_M64}
                   ELSE COALESCE(s.packed, 0) END AS BIGINT) AS simhash
  FROM (SELECT doc_id FROM {docs_rel}) d LEFT JOIN sig0 s USING (doc_id))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# Ray-side helpers
# ---------------------------------------------------------------------------

def _transcripts_ds(sf_dir):
    from pgd_ray.sources.transcripts import derive_transcripts

    return derive_transcripts(sf_dir)


_BUNDLE_CACHE: dict = {}


def _copurchase_bundle(sf_dir):
    """Canonical copurchase edges (raw part ids) + dense CSR + id map.
    Cached per sf_dir — six queries share the same graph build."""
    if sf_dir in _BUNDLE_CACHE:
        return _BUNDLE_CACHE[sf_dir]
    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.normalize import densify, vertex_ids
    from pgd_ray.sources.edges import edges_copurchase

    eds = edges_copurchase(sf_dir).materialize()
    vids = vertex_ids(eds)
    dense = densify(eds, vids).materialize()
    csr = build_csr(dense, n=len(vids))
    _BUNDLE_CACHE.clear()
    _BUNDLE_CACHE[sf_dir] = (eds, dense, csr, vids)
    return _BUNDLE_CACHE[sf_dir]


_TOOL_CACHE: dict = {}


def _tool_graph(sf_dir):
    if sf_dir in _TOOL_CACHE:
        return _TOOL_CACHE[sf_dir]
    from pgd_ray.graph.csr import build_csr
    from pgd_ray.sources.edges import edges_from_transcripts

    tds = _transcripts_ds(sf_dir)
    eds, vocab = edges_from_transcripts(tds, return_vocab=True)
    eds = eds.materialize()
    _TOOL_CACHE.clear()
    _TOOL_CACHE[sf_dir] = (eds, build_csr(eds, n=len(vocab)), vocab)
    return _TOOL_CACHE[sf_dir]


def _macro_frame(mac) -> pd.DataFrame:
    from pgd_ray.graph.graphlets import MACRO_KEYS

    return pd.DataFrame([{k: np.int64(mac[k]) for k in MACRO_KEYS}])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_transcripts(sf_dir):
    return _transcripts_ds(sf_dir)


def _q_transcript_edges(sf_dir):
    from pgd_ray.sources.edges import edges_from_transcripts

    return edges_from_transcripts(_transcripts_ds(sf_dir))


def _q_edges_copurchase(sf_dir):
    from pgd_ray.sources.edges import edges_copurchase

    return edges_copurchase(sf_dir)


def _q_degree_table(sf_dir):
    from pgd_ray.graph.degrees import degree_table
    from pgd_ray.sources.edges import edges_copurchase

    return degree_table(edges_copurchase(sf_dir))


def _q_graph_stats(sf_dir):
    from pgd_ray.graph.degrees import graph_stats
    from pgd_ray.sources.edges import edges_copurchase

    df = graph_stats(edges_copurchase(sf_dir).materialize())
    df["density"] = df["density"].round(9)
    df["d_avg"] = df["d_avg"].round(9)
    return df


def _q_assortativity(sf_dir):
    from pgd_ray.graph.degrees import assortativity
    from pgd_ray.sources.edges import edges_copurchase

    r = assortativity(edges_copurchase(sf_dir).materialize())
    return pd.DataFrame([{"r": round(r, 9)}])


def _q_triangle_count(sf_dir):
    from pgd_ray.graph.graphlets import edge_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    # fragment-backed kernel path (no assembled whole-graph arrays):
    # the at-scale posture, correctness-gated here against the oracle
    tri = edge_triangles(dense, csr.range_csr or csr)
    total = 0
    for b in tri.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        total += int(b["triangle"].to_numpy(zero_copy_only=False).sum())
    return pd.DataFrame([{"total_3_tris": np.int64(total // 3)}])


def _q_edge_triangles(sf_dir):
    from pgd_ray.graph.graphlets import edge_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    tri = edge_triangles(dense, csr.range_csr or csr).to_pandas()
    # map dense ids back to raw part keys for the SQL comparison
    tri["src"] = vids[tri["src"].to_numpy()]
    tri["dst"] = vids[tri["dst"].to_numpy()]
    return tri[["src", "dst", "triangle"]]


def _q_edge_clustering(sf_dir):
    """Per-edge Radicchi clustering coefficient (tri+1)/(min deg −1)
    — graph.graphlets.edge_clustering (sorted-intersection triangle
    kernel + one broadcast degree decorate; task stage, module-cache
    broadcast)."""
    from pgd_ray.graph.graphlets import edge_clustering

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = edge_clustering(dense, csr.range_csr or csr).to_pandas()
    out["src"] = vids[out["src"].to_numpy()]
    out["dst"] = vids[out["dst"].to_numpy()]
    return out[["src", "dst", "triangle", "ecc"]]


def _q_trending_daily(sf_dir):
    """Top-3 event types per day ("trending"): one (day, type) hash
    aggregate → stages.topn.grouped_topk per day (sorted blocks +
    O(k·#blocks) stitch, never a per-day map_groups)."""
    import pyarrow as pa

    from pgd_ray.stages.topn import grouped_topk
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"day": pa.array(day, pa.int64()),
                         "event_type": t["event_type"]})

    from ray.data.aggregate import Count

    counts = (ev.map_batches(keyed, batch_format="pyarrow")
              .groupby(["day", "event_type"])
              .aggregate(Count(alias_name="n")))
    top = grouped_topk(counts, "day", ["n", "event_type"],
                       [True, False], k=3).to_pandas()
    top["n"] = top["n"].astype(np.int64)
    top["rnk"] = top["rnk"].astype(np.int64)
    return top[["day", "event_type", "n", "rnk"]].sort_values(
        ["day", "rnk"], ignore_index=True)


def _q_cusum_daily(sf_dir):
    """Two-sided CUSUM changepoint screen over standardized daily
    event counts — stages.windows.cusum_daily (distributed day agg,
    O(days) driver recurrence)."""
    from pgd_ray.stages.windows import cusum_daily

    return cusum_daily(sf_dir, k=0.5, h=4.0)


def _q_dow_seasonality(sf_dir):
    """Day-of-week seasonality indices of the daily event count —
    stages.windows.dow_seasonality."""
    from pgd_ray.stages.windows import dow_seasonality

    return dow_seasonality(sf_dir)


def _q_wedges_cc(sf_dir):
    from pgd_ray.graph.degrees import degree_array
    from pgd_ray.graph.graphlets import edge_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    deg = csr.degrees().astype(np.int64)
    tris = 0
    for b in edge_triangles(dense, csr).iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        tris += int(b["triangle"].to_numpy(zero_copy_only=False).sum())
    tris //= 3
    wedges = int((deg * (deg - 1) // 2).sum())
    cc = round(3.0 * tris / wedges, 9) if wedges else 0.0
    return pd.DataFrame(
        [{"total_wedges": np.int64(wedges), "global_cc": cc}]
    )


def _q_macro_tool_graph(sf_dir):
    from pgd_ray.graph.graphlets import graphlet_macro

    eds, csr, vocab = _tool_graph(sf_dir)
    # fragment-backed kernels (RangeCSR handle) — the broadcast arrays
    # are never required for this row's green status
    return _macro_frame(graphlet_macro(eds, csr.range_csr or csr, concurrency=(1, 4)))


def _q_cc_copurchase(sf_dir):
    from pgd_ray.graph.iterative import connected_components

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    comp = connected_components(csr)
    return pd.DataFrame({"v": vids, "component": vids[comp]})


def _q_pagerank_copurchase(sf_dir):
    from pgd_ray.graph.iterative import pagerank

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    # tol 1e-15 drives the score to its float64 fixpoint so the round-9
    # values are stable against the oracle's fixed-300-iteration SQL
    pr = pagerank(csr, tol=1e-15, max_iter=400)
    return pd.DataFrame({"v": vids, "score": np.round(pr, 9)})


def _q_anf_copurchase(sf_dir):
    """HyperANF neighborhood sketches after 8 rounds —
    graph.iterative.anf_registers (packed 6-bit HLL lanes, lane-max
    merge; integer-deterministic)."""
    from pgd_ray.graph.iterative import anf_registers

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    regs = anf_registers(csr, rounds=8)
    return pd.DataFrame({"v": vids, "regs": regs})


def _q_neighborhood_function(sf_dir):
    """HyperANF neighborhood function N(h) for h=0..8 with the integer
    effective diameter flagged — graph.iterative.neighborhood_function
    (per-round states via the extras hook, zero extra passes)."""
    from pgd_ray.graph.iterative import neighborhood_function

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    hs, nf, eff = neighborhood_function(csr, rounds=8)
    return pd.DataFrame({
        "h": hs,
        "nf": np.round(nf, 4),
        "is_eff": (hs == eff).astype(np.int64),
    })


def _q_coloring_copurchase(sf_dir):
    """Jones-Plassmann greedy coloring — graph.iterative
    .greedy_coloring (static bijective priorities; winners take the
    mex of colored neighbors; pure function of the graph)."""
    from pgd_ray.graph.iterative import greedy_coloring

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    c = greedy_coloring(csr)
    return pd.DataFrame({"v": vids, "color": c})


def _q_mis_copurchase(sf_dir):
    from pgd_ray.graph.iterative import maximal_independent_set

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    # deterministic Luby rounds — priorities are a pure hash of
    # (dense id, round), so the recursive-CTE oracle replays them
    m = maximal_independent_set(csr)
    return pd.DataFrame({"v": vids, "in_mis": m})


def _q_monthly_graph(sf_dir):
    """Per-month co-purchase subgraph stats — graph.temporal
    .monthly_graph_stats (two native hash joins carry the order month
    onto the pair expansion; months are the parallel kernel axis)."""
    from pgd_ray.graph.temporal import monthly_graph_stats

    return monthly_graph_stats(sf_dir)


def _q_msf_copurchase(sf_dir):
    """Maximum spanning forest of the co-occurrence-weighted
    copurchase graph — graph.mst.max_spanning_forest (Borůvka over the
    distributed pair_counts aggregate; the strict key (w DESC, a, b)
    makes the forest unique, so the unrolled-Borůvka SQL oracle must
    agree edge-for-edge)."""
    from pgd_ray.graph.mst import max_spanning_forest

    return max_spanning_forest(sf_dir)


def _q_matching_copurchase(sf_dir):
    """Deterministic local-min-edge maximal matching —
    graph.matching.maximal_matching (Luby coins on the line graph:
    distinct per-round edge priorities, a pure function of the graph,
    replayed bit-exactly by the recursive-CTE oracle)."""
    from pgd_ray.graph.matching import maximal_matching

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    mate = maximal_matching(csr)
    vid_arr = np.asarray(vids)
    mate_raw = np.where(mate >= 0, vid_arr[np.where(mate >= 0, mate, 0)], -1)
    return pd.DataFrame({"v": vid_arr, "mate": mate_raw})


def _q_fiedler_copurchase(sf_dir):
    """Fiedler (spectral-bisection) vector — graph.iterative
    .fiedler_vector (fixed 64 deflated power-iteration rounds on
    (Δ+1)I − L from the ramp start; centering each round removes the
    constant kernel).  Pure function of the graph; the oracle replays
    the identical per-element expressions."""
    from pgd_ray.graph.iterative import fiedler_vector

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    x = fiedler_vector(csr, iters=64)
    return pd.DataFrame({"v": vids, "score": np.round(x, 9)})


def _q_eigencen_copurchase(sf_dir):
    from pgd_ray.graph.iterative import eigenvector_centrality

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    # fixed 64 power-iteration rounds — a pure function of the graph,
    # mirrored 1:1 by the recursive-CTE oracle
    x = eigenvector_centrality(csr, iters=64)
    return pd.DataFrame({"v": vids, "score": np.round(x, 9)})


def _q_katz_copurchase(sf_dir):
    from pgd_ray.graph.iterative import katz_centrality

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    # α = 0.5/Δ ≤ 0.5/λ_max makes the Jacobi iteration a contraction
    # (truncation error ≤ 2^-32 after the fixed 32 rounds), and the
    # oracle derives the SAME scalar from its degree CTE — both sides
    # compute 0.5/Δ in IEEE float64, so the mirror is exact
    alpha = 0.5 / max(1, int(np.diff(csr.indptr).max()))
    x = katz_centrality(csr, alpha=alpha, beta=1.0, iters=32)
    return pd.DataFrame({"v": vids, "score": np.round(x, 9)})


def _q_markov_stationary(sf_dir):
    """Stationary distribution of the per-user event-type Markov chain
    (64 fixed rounds of pi <- pi·P from uniform over the T observed
    types, P row-normalized from the distributed transition counts) —
    the thin-side-iteration pattern again: the heavy count is
    distributed, the T x T chain iterates on the driver."""
    from pgd_ray.stages.windows import transition_counts

    tc = transition_counts(sf_dir).to_pandas()
    if tc.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "pi": pd.Series([], dtype=np.float64)})
    types = np.sort(pd.unique(pd.concat([tc["type_from"], tc["type_to"]])))
    tid = {t: i for i, t in enumerate(types)}
    T = len(types)
    C = np.zeros((T, T), dtype=np.float64)
    C[tc["type_from"].map(tid).to_numpy(),
      tc["type_to"].map(tid).to_numpy()] = tc["n_trans"].to_numpy(np.float64)
    out = C.sum(axis=1)
    P = np.where(out[:, None] > 0, C / np.maximum(out, 1.0)[:, None],
                 1.0 / T)  # dangling rows: uniform
    pi = np.full(T, 1.0 / T)
    for _ in range(64):
        pi = pi @ P
    return pd.DataFrame({"event_type": types, "pi": np.round(pi, 9)})


def _q_char_entropy(sf_dir):
    """Per-doc byte-distribution entropy — text.entropy.char_entropy
    (pure map stage, one row per doc)."""
    from pgd_ray.text.entropy import char_entropy

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return char_entropy(docs).to_pandas()


def _q_unigram_xent(sf_dir):
    """Per-doc unigram cross-entropy under the corpus MLE —
    text.lm.unigram_cross_entropy (two streaming passes)."""
    from pgd_ray.text.lm import unigram_cross_entropy

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_cross_entropy(docs).to_pandas()


def _q_user_entropy(sf_dir):
    """Per-user Shannon entropy of the event-type mix (behavioral
    diversity) — one (user,type) hash agg, entropy folded from the
    <= |users|·|types| count rows."""
    from ray.data.aggregate import Count

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    cnt = (ev.groupby(["user_id", "event_type"])
           .aggregate(Count(alias_name="c")).to_pandas())
    tot = cnt.groupby("user_id")["c"].transform("sum")
    p = cnt["c"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    ent = (cnt.assign(term=-p * np.log(p))
           .groupby("user_id", as_index=False)
           .agg(n_events=("c", "sum"), entropy=("term", "sum")))
    return pd.DataFrame({
        "user_id": ent["user_id"].astype(np.int64),
        "n_events": ent["n_events"].astype(np.int64),
        "entropy": np.round(ent["entropy"], 6) + 0.0,  # -0.0 -> 0.0
    }).sort_values("user_id", ignore_index=True)


def _q_chi2_type_dow(sf_dir):
    """Pearson chi-square independence statistic of event_type x
    day-of-week — observed counts distributed, the |types|·7 expected
    table folded on the driver.  One row (chi2, dof)."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    ev = _read(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        us = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        # epoch day 0 = Thursday; dow 0 = Monday like isodow-1
        return pa.table({"event_type": t["event_type"],
                         "dow": (us // 86_400_000_000 + 3) % 7})

    obs = (ev.map_batches(keyed, batch_format="pyarrow")
           .groupby(["event_type", "dow"])
           .aggregate(Count(alias_name="o")).to_pandas())
    n = float(obs["o"].sum())
    rt = obs.groupby("event_type")["o"].transform("sum").to_numpy(np.float64)
    ct = obs.groupby("dow")["o"].transform("sum").to_numpy(np.float64)
    e = rt * ct / n
    chi2 = float((((obs["o"].to_numpy(np.float64) - e) ** 2) / e).sum())
    dof = (obs["event_type"].nunique() - 1) * (obs["dow"].nunique() - 1)
    return pd.DataFrame({"chi2": [round(chi2, 6)],
                         "dof": [np.int64(dof)]})


def _q_benford_prices(sf_dir):
    """Benford first-digit audit of o_totalprice: observed share per
    leading digit vs log10(1 + 1/d) — the classic bookkeeping
    anomaly screen."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def digit(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        v = v[v > 0]
        # floor, NOT a double->int cast: DuckDB CAST rounds half-even
        # while numpy astype truncates — floor() is the shared rule
        d = np.floor(v / np.power(10.0, np.floor(np.log10(v)))).astype(np.int64)
        return pa.table({"digit": d})

    obs = (orders.map_batches(digit, batch_format="pyarrow")
           .groupby("digit").aggregate(Count(alias_name="n"))
           .to_pandas())
    tot = float(obs["n"].sum())
    d = obs["digit"].to_numpy(np.float64)
    return pd.DataFrame({
        "digit": obs["digit"].astype(np.int64),
        "n": obs["n"].astype(np.int64),
        "share": np.round(obs["n"].to_numpy(np.float64) / tot, 6),
        "benford": np.round(np.log10(1.0 + 1.0 / d), 6),
    }).sort_values("digit", ignore_index=True)


def _q_json_props(sf_dir):
    """Semi-structured extraction + per-type profile of props.k —
    stages.cube.json_props_stats (vectorized extraction, two-level
    distinct)."""
    from pgd_ray.stages.cube import json_props_stats

    return json_props_stats(sf_dir)


def _q_clustering_spectrum(sf_dir):
    """Clustering spectrum c(k) = mean local clustering per degree
    class — the Watts-Strogatz curve, derived from the distributed
    vertex-triangle kernel."""
    from pgd_ray.graph.graphlets import local_clustering

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    df = local_clustering(dense, csr).to_pandas()
    d = df["degree"].to_numpy(np.float64)
    t = df["triangles"].to_numpy(np.float64)
    ratio = np.where(d >= 2, 2.0 * t / (d * (d - 1.0)), 0.0)
    g = (pd.DataFrame({"degree": df["degree"].astype(np.int64),
                       "r": ratio})
         .groupby("degree", as_index=False)
         .agg(n_vertices=("r", "size"), c_k=("r", "mean")))
    g["n_vertices"] = g["n_vertices"].astype(np.int64)
    g["c_k"] = g["c_k"].round(6)
    return g


def _q_ewma_daily(sf_dir):
    """EWMA-smoothed daily counts per type —
    stages.windows.ewma_daily (distributed daily agg, O(days) driver
    recurrence)."""
    from pgd_ray.stages.windows import ewma_daily

    return ewma_daily(sf_dir, alpha=0.3)


def _q_type_runs(sf_dir):
    """Per-user maximal equal-type run stats (SCD-2 change tracking)
    — stages.windows.type_runs (sorted-block change points +
    boundary-user stitch, O(#users) driver aggregate)."""
    from pgd_ray.stages.windows import type_runs

    return type_runs(sf_dir)


def _q_acf_daily(sf_dir):
    """Autocorrelation (lags 1..7) of the daily event count —
    stages.windows.acf_daily (distributed day agg, O(days) driver
    estimator over the observed-day sequence)."""
    from pgd_ray.stages.windows import acf_daily

    return acf_daily(sf_dir, max_lag=7)


def _q_event_islands(sf_dir):
    """Gaps-and-islands over per-user event_id runs —
    stages.windows.event_islands (sorted blocks + boundary stitch)."""
    from pgd_ray.stages.windows import event_islands

    return event_islands(sf_dir)


def _q_grouped_ols(sf_dir):
    """Per-type OLS of value ~ time — stages.regress.grouped_ols
    (five-sum partials, centered exact-integer origin)."""
    from pgd_ray.stages.regress import grouped_ols

    return grouped_ols(sf_dir)


def _q_fuzzy_names(sf_dir):
    """Token-blocked Levenshtein <= 2 pairs over DISTINCT part names —
    stages.fuzzy.fuzzy_name_pairs (vocabulary-level entity-resolution
    candidates + verify)."""
    from pgd_ray.stages.fuzzy import fuzzy_name_pairs

    return fuzzy_name_pairs(sf_dir, max_dist=2)


def _q_bloom_semi_orders(sf_dir):
    """Orders of high-balance customers via the Bloom-prefiltered
    exact semi-join — stages.bloom.bloom_semi_join (no-false-negative
    prefilter sheds probe volume; the verify join makes the output
    exactly the semi-join)."""
    import pyarrow.compute as pc_

    from pgd_ray.stages.bloom import bloom_semi_join

    cust = _read(f"{sf_dir}/customer.parquet",
                 columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc_.greater(t["c_acctbal"], 5000.0)),
        batch_format="pyarrow")
    orders = _read(f"{sf_dir}/orders.parquet",
                   columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    j = bloom_semi_join(orders, cust, key="o_custkey",
                        build_key="c_custkey")
    from ray.data.aggregate import Count, Sum
    agg = (j.groupby("o_orderpriority")
           .aggregate(Count(alias_name="n"),
                      Sum("o_totalprice", alias_name="total"))
           .to_pandas())
    agg["n"] = agg["n"].astype(np.int64)
    agg["total"] = agg["total"].round(2)
    return agg.sort_values("o_orderpriority", ignore_index=True)


def _q_value_quartiles(sf_dir):
    """Per-type quartile-bucket counts of events.value — thresholds
    from the exact distributed quantile engine (rank rule
    floor(q·(n-1)), lower value), bucketing one vectorized pass."""
    from pgd_ray.stages.quantiles import exact_quantiles

    ev = _read(f"{sf_dir}/events.parquet",
               columns=["event_type", "value"]).materialize()
    thr = exact_quantiles(
        ev.select_columns(["value"]), "value", [0.25, 0.5, 0.75],
        bins=64, fetch_cap=100,
    )["value"].to_numpy(np.float64)

    import pyarrow as pa

    def bucketed(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "bucket": np.searchsorted(thr, v, side="right").astype(np.int64),
        })

    from ray.data.aggregate import Count
    agg = (ev.map_batches(bucketed, batch_format="pyarrow")
           .groupby(["event_type", "bucket"])
           .aggregate(Count(alias_name="n_events"))
           .to_pandas())
    agg["n_events"] = agg["n_events"].astype(np.int64)
    return agg.sort_values(["event_type", "bucket"], ignore_index=True)


def _q_embedding_covariance(sf_dir):
    """Upper-triangle covariance of embedding dims —
    stages.vector_stats.embedding_covariance (gram partials,
    O(#batches·d²) exchange)."""
    from pgd_ray.stages.vector_stats import embedding_covariance

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_covariance(ds)


def _q_source_overlap(sf_dir):
    """Cross-source 5-word-shingle Jaccard matrix — text.analysis
    .source_shingle_overlap (two hash aggregations + bitmask
    popcounts, no pairwise shuffle)."""
    from pgd_ray.text.analysis import source_shingle_overlap

    docs = _read(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_shingle_overlap(docs, k=5)


def _q_readability(sf_dir):
    """Per-doc Flesch reading ease from exact regex-run counts —
    text.analysis.readability (compiled patterns per actor, pandas C
    counting; integer counts exact on both sides of the mirror)."""
    from pgd_ray.text.analysis import readability

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return readability(docs)


def _q_centroid_confusion(sf_dir):
    """Nearest-centroid label confusion over embeddings —
    stages.clustering.centroid_confusion (distributed per-label mean,
    broadcast L×d matrix, cosine argmax with ties → smaller label)."""
    from pgd_ray.stages.clustering import centroid_confusion

    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding", "label"])
    return centroid_confusion(emb)


def _q_intrinsic_dim(sf_dir):
    """TwoNN intrinsic-dimension MLE over the embedding cloud —
    stages.vector_stats.intrinsic_dimension (broadcast corpus,
    2-float partial per batch)."""
    from pgd_ray.stages.vector_stats import intrinsic_dimension

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding"])
    return intrinsic_dimension(ds)


def _q_jl_ratios(sf_dir):
    """Per-vector JL norm distortion ||Rx||²/||x||² under the
    deterministic ±1/√16 Rademacher matrix (signs = splitmix64 low
    bit) — stages.vector_stats.jl_norm_ratios (stateless vectorized
    map; the oracle rebuilds R bit-for-bit)."""
    from pgd_ray.stages.vector_stats import jl_norm_ratios

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding"])
    return jl_norm_ratios(ds, p=16)


def _q_knn_clusters(sf_dir):
    """Mutual-kNN-graph connected components over the embedding table
    — stages.similarity.mutual_knn_clusters (broadcast-corpus exact
    top-5 per vector, mutual filter by pair-count, min-label CC over
    the thin mutual edge list)."""
    from pgd_ray.stages.similarity import mutual_knn_clusters

    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    return mutual_knn_clusters(emb, k=5)


def _q_pca_embeddings(sf_dir):
    """Per-vector projection onto the top principal component —
    stages.vector_stats.pca_top_component (one distributed gram-partial
    pass builds the 64x64 covariance; fixed 64 power-iteration rounds
    from the uniform unit start run on the driver — the
    thin-side-iteration pattern) + pca_project (stateless vectorized
    map).  A pure function of the data, so the recursive-CTE oracle
    replays the identical iteration."""
    from pgd_ray.stages.vector_stats import pca_project, pca_top_component

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding"]).materialize()
    mu, v, lam = pca_top_component(ds)
    return pca_project(ds, mu, v)


def _q_window_distinct_users(sf_dir):
    """Exact distinct users per tumbling hour —
    stages.windows.window_distinct_users (two-level hash agg)."""
    from pgd_ray.stages.windows import window_distinct_users

    return window_distinct_users(sf_dir)


def _q_conductance_tool(sf_dir):
    """Per-community conductance of the LP labeling on the tool graph
    — graph.community.conductance_by_label (edge side distributed,
    labels broadcast once)."""
    from pgd_ray.graph.community import conductance_by_label
    from pgd_ray.graph.iterative import label_propagation

    eds, csr, vocab = _tool_graph(sf_dir)
    lab = label_propagation(csr, max_iter=20)
    return conductance_by_label(eds, csr, lab)


def _q_conductance_cores(sf_dir):
    """Per-level conductance of the k-core decomposition layers on the
    copurchase graph — a labeling with REAL cut edges (unlike LP on
    the tool graph, which converges to one community)."""
    from pgd_ray.graph.community import conductance_by_label
    from pgd_ray.graph.iterative import kcore

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    core = kcore(csr)
    out = conductance_by_label(dense, csr, core)
    return out.rename(columns={"label": "core"})


def _q_weighted_pagerank(sf_dir):
    """PageRank with co-purchase-count edge weights, 32 fixed rounds.
    Integer weights enter the distributed CSR build as w parallel
    edges (build_csr(dedup=False) — the multigraph path), so the
    UNCHANGED pagerank gather kernel computes the weighted message
    sum Σ w·x/wdeg and np.diff(indptr) IS the weighted degree."""
    import pyarrow as pa
    import ray as _ray

    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.iterative import IterativeEngine
    from pgd_ray.stages.basket import pair_counts

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    vref = _ray.put(vids)

    def expand(t, vref):
        v = _ray.get(vref) if isinstance(vref, _ray.ObjectRef) else vref
        a = np.searchsorted(v, t["part_a"].to_numpy(zero_copy_only=False))
        b = np.searchsorted(v, t["part_b"].to_numpy(zero_copy_only=False))
        w = t["n_both"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.repeat(a, w), "dst": np.repeat(b, w)})

    exp = pair_counts(sf_dir).map_batches(
        expand, fn_kwargs={"vref": vref}, batch_format="pyarrow"
    ).materialize()
    wcsr = build_csr(exp, n=len(vids), dedup=False)
    n = wcsr.n
    base = (1.0 - 0.85) / n
    eng = IterativeEngine(wcsr, "pagerank", n_workers=8)
    x, _ = eng.run(
        np.full(n, 1.0 / n),
        lambda s: {"base": base, "alpha": 0.85},
        lambda d: False, 32,
        extras_from_stats=lambda st: {"base": base, "alpha": 0.85},
    )
    return pd.DataFrame({"v": vids, "score": np.round(x, 9)})


def _q_silhouette(sf_dir):
    """Per-cluster simplified silhouette of the deterministic k-means
    fit — stages.clustering.silhouette_by_cluster (one extra pass,
    k x d broadcast, <= k-row exchange)."""
    from pgd_ray.stages.clustering import silhouette_by_cluster

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding"])
    return silhouette_by_cluster(ds, k=8, iters=4)


def _q_diameter_lb(sf_dir):
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib): BFS
    from the smallest part key, re-BFS from the farthest vertex (ties
    -> min raw id), report the eccentricity found."""
    from pgd_ray.graph.iterative import bfs_distances

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seed = int(np.argmin(vids))
    d1 = bfs_distances(csr, [seed])
    reach1 = d1 < csr.n
    best = d1[reach1].max()
    cand = np.flatnonzero(reach1 & (d1 == best))
    far = int(cand[np.argmin(vids[cand])])
    d2 = bfs_distances(csr, [far])
    reach2 = d2 < csr.n
    return pd.DataFrame({
        "start_v": [int(vids[seed])],
        "far_v": [int(vids[far])],
        "diameter_lb": [int(d2[reach2].max())],
    })


def _q_basket_lift(sf_dir):
    """Market-basket association lift over (order, part) incidences —
    stages.basket.basket_lift (hash self-join pair expansion, driver
    sees only >= min_both pairs)."""
    from pgd_ray.stages.basket import basket_lift

    return basket_lift(sf_dir, min_both=3)


def _q_comp_size_hist(sf_dir):
    """Component-size histogram of the >= 3-support co-purchase graph
    (a genuinely multi-component graph, unlike the raw copurchase
    giant component) — basket pair counts -> threshold -> distributed
    CC -> size histogram."""
    import pyarrow.compute as pc_

    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.iterative import connected_components
    from pgd_ray.graph.normalize import densify, vertex_ids
    from pgd_ray.stages.basket import pair_counts

    eds = pair_counts(sf_dir).map_batches(
        lambda t: t.filter(pc_.greater_equal(t["n_both"], 3))
        .select(["part_a", "part_b"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow",
    ).materialize()
    if eds.count() == 0:
        return pd.DataFrame({"size": pd.Series([], dtype=np.int64),
                             "n_components": pd.Series([], dtype=np.int64)})
    vids = vertex_ids(eds)
    dense = densify(eds, vids).materialize()
    comp = connected_components(build_csr(dense, n=len(vids)))
    sizes = np.bincount(comp)
    sizes = sizes[sizes > 0]
    u, c = np.unique(sizes, return_counts=True)
    return pd.DataFrame({"size": u.astype(np.int64),
                         "n_components": c.astype(np.int64)})


def _q_pmi_collocations(sf_dir):
    """PMI collocations over the document corpus — text.lm
    .pmi_collocations (streaming bigram/unigram partials; driver sees
    only frequent pairs)."""
    from pgd_ray.text.lm import pmi_collocations

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pmi_collocations(docs, min_count=5)


def _q_decayed_counts(sf_dir):
    """Per-type exponentially-decayed counts at the corpus horizon —
    stages.windows.decayed_counts (two streaming passes)."""
    from pgd_ray.stages.windows import decayed_counts

    return decayed_counts(sf_dir)


def _q_inter_event_gaps(sf_dir):
    """Per-type inter-arrival stats — stages.windows.inter_event_gaps
    (sorted blocks, integer-exact partials, boundary stitch)."""
    from pgd_ray.stages.windows import inter_event_gaps

    return inter_event_gaps(sf_dir)


def _q_rollup_events(sf_dir):
    """ROLLUP lattice over (event_type, day) — stages.cube.rollup_counts
    (one base scan, coarser levels folded from the base cube)."""
    from pgd_ray.stages.cube import rollup_counts

    return rollup_counts(sf_dir, exact_cents=True)


def _q_pivot_user_types(sf_dir):
    """Long-to-wide per-user type counts — stages.cube.pivot_counts
    (per-batch crosstab partials, one hash aggregation)."""
    from pgd_ray.stages.cube import pivot_counts

    return pivot_counts(sf_dir)


def _q_bpe_pairs(sf_dir):
    """Top-32 adjacent byte pairs (one BPE merge round's count table)
    — text.bpe.byte_pair_counts (bincount partials, 64K-cell merge)."""
    from pgd_ray.text.bpe import byte_pair_counts

    return byte_pair_counts(sf_dir, top=32)


def _q_avg_neighbor_degree(sf_dir):
    from pgd_ray.graph.iterative import IterativeEngine

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    deg = np.diff(csr.indptr).astype(np.float64)
    # one gather round of the katz program with (α=1, β=0) from
    # state = degrees is exactly Σ_{u∈N(v)} deg(u) — reuse the
    # distributed executor instead of a bespoke kernel
    eng = IterativeEngine(csr, "katz", n_workers=8)
    snd, _ = eng.run(deg, lambda s: {"alpha": 1.0, "beta": 0.0},
                     lambda d: False, 1)
    df = pd.DataFrame({
        "degree": deg.astype(np.int64),
        "nbr_mean": snd / np.maximum(deg, 1.0),
    })
    out = df.groupby("degree", as_index=False)["nbr_mean"].mean()
    return pd.DataFrame({"degree": out["degree"],
                         "knn": np.round(out["nbr_mean"], 9)})


def _q_hits_authorities(sf_dir):
    from pgd_ray.graph.bipartite import hits_scores

    auth, _hubs = hits_scores(sf_dir, iters=32)
    return auth


def _q_hits_hubs(sf_dir):
    from pgd_ray.graph.bipartite import hits_scores

    _auth, hubs = hits_scores(sf_dir, iters=32)
    return hubs


def _q_butterflies(sf_dir):
    from pgd_ray.graph.bipartite import butterflies_per_type

    return butterflies_per_type(sf_dir)


def _q_kcore_copurchase(sf_dir):
    from pgd_ray.graph.iterative import kcore

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return pd.DataFrame({"v": vids, "core": kcore(csr).astype(np.int64)})


def _q_ktruss_copurchase(sf_dir):
    from pgd_ray.graph.truss import ktruss_edges

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    kept = ktruss_edges(dense, csr, k=5).to_pandas()
    if kept.empty:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    kept["src"] = vids[kept["src"].to_numpy()]
    kept["dst"] = vids[kept["dst"].to_numpy()]
    # canonical orientation on RAW ids for the SQL comparison
    lo = np.minimum(kept["src"], kept["dst"])
    hi = np.maximum(kept["src"], kept["dst"])
    return pd.DataFrame({"src": lo, "dst": hi})


def _q_wl_colors(sf_dir):
    """1-WL color refinement, 3 rounds, commutative splitmix combine —
    graph.wl.wl_colors (per-round broadcast color vector, segmented
    sums per contiguous vertex batch)."""
    from pgd_ray.graph.wl import wl_colors

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = wl_colors(csr, rounds=3)
    out["v"] = vids[out["v"].to_numpy()]
    return out.astype({"v": np.int64, "color": np.int64})


def _q_rich_club(sf_dir):
    """Rich-club coefficients phi(k) for k in {0,50,100,150} —
    graph.richclub.rich_club (one edge pass against the broadcast
    degree vector, |ks|+1 partial counters per batch)."""
    from pgd_ray.graph.richclub import rich_club

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = rich_club(dense, csr.degrees().astype(np.int64),
                    ks=[0, 50, 100, 150])
    return out.astype({"k": np.int64, "n_k": np.int64, "e_k": np.int64})


def _q_s_metric(sf_dir):
    """s-metric Σ deg(u)·deg(v) over edges — graph.richclub.s_metric."""
    from pgd_ray.graph.richclub import s_metric

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    s = s_metric(dense, csr.degrees().astype(np.int64))
    return pd.DataFrame({"s_metric": [np.int64(s)]})


def _q_two_hop_sizes(sf_dir):
    """Exact distance<=2 neighborhood cardinality per vertex —
    graph.twohop.two_hop_sizes (plasma-shared CSR, stateless-task
    kernel, segment-gather per vertex)."""
    from pgd_ray.graph.twohop import two_hop_sizes

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = two_hop_sizes(csr).to_pandas().sort_values("v", ignore_index=True)
    out["v"] = vids[out["v"].to_numpy()]
    return out.astype({"v": np.int64, "n2": np.int64})


def _q_onion_copurchase(sf_dir):
    """Onion decomposition (peel layer + core per vertex) —
    graph.onion.onion_layers task kernel; the recursive-CTE oracle
    replays the exact threshold schedule k <- max(k, min live
    degree)."""
    from pgd_ray.graph.onion import onion_layers

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = onion_layers(dense, csr).to_pandas()
    out["v"] = vids[out["v"].to_numpy()]
    return out.astype({"v": np.int64, "layer": np.int64, "core": np.int64})


def _q_densest_copurchase(sf_dir):
    """Densest-subgraph threshold peel (Bahmani et al. 2012, eps=0.5)
    — graph.densest.densest_subgraph; the removal rule is exact int64
    arithmetic (deg*|S| > 3*m), so the recursive-CTE oracle replays
    every round bit-identically."""
    from pgd_ray.graph.densest import densest_subgraph

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    r = densest_subgraph(eds)
    return pd.DataFrame([{
        "best_round": np.int64(r["best_round"]),
        "n_sub": np.int64(r["n_sub"]),
        "m_sub": np.int64(r["m_sub"]),
        "density": np.round(r["density"], 9),
        "rounds": np.int64(r["rounds"]),
    }])


def _q_link_pred_copurchase(sf_dir):
    from pgd_ray.graph.linkpred import link_prediction

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    head = link_prediction(csr, top_n=100)
    # vids is ascending, so the (cn desc, u, v) order survives the map
    head["u"] = vids[head["u"].to_numpy()]
    head["v"] = vids[head["v"].to_numpy()]
    return head[["u", "v", "cn", "aa"]]


def _q_link_pred_scores_copurchase(sf_dir):
    """Full similarity-index head: cn/aa plus resource-allocation,
    Jaccard and preferential-attachment columns (graph/linkpred.py)."""
    from pgd_ray.graph.linkpred import link_prediction

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    head = link_prediction(csr, top_n=50)
    head["u"] = vids[head["u"].to_numpy()]
    head["v"] = vids[head["v"].to_numpy()]
    return head


def _q_random_walks_copurchase(sf_dir):
    from pgd_ray.graph.walks import random_walks

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    df = random_walks(csr, length=8).to_pandas()
    # hashes are computed on DENSE ids; vids is ascending so the SQL
    # mirror reconstructs them with row_number() over ordered raw ids
    df["walk_id"] = vids[df["walk_id"].to_numpy()]
    df["v"] = vids[df["v"].to_numpy()]
    return df


def _q_bfs_copurchase(sf_dir):
    from pgd_ray.graph.iterative import bfs_distances

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seed = int(np.argmin(vids))  # dense id of the smallest raw part key
    dist = bfs_distances(csr, [seed])
    reached = dist < csr.n  # drop the unreachable sentinel, like the SQL
    return pd.DataFrame({"v": vids[reached], "dist": dist[reached]})


def _q_harmonic_copurchase(sf_dir):
    """Sampled harmonic centrality from the 4 smallest part keys —
    graph.centrality (k BFS sweeps over a shared worker pool)."""
    from pgd_ray.graph.centrality import harmonic_centrality

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seeds = np.argsort(vids)[:4]
    h = harmonic_centrality(csr, seeds)
    return pd.DataFrame({"v": vids, "harmonic": np.round(h, 6)})


def _q_closeness_copurchase(sf_dir):
    """Sampled Wasserman-Faust closeness from the 4 smallest part
    keys — graph.centrality.closeness_centrality (k BFS sweeps on the
    shared worker pool)."""
    from pgd_ray.graph.centrality import closeness_centrality

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seeds = np.argsort(vids)[:4]
    c = closeness_centrality(csr, seeds)
    return pd.DataFrame({"v": vids, "closeness": np.round(c, 6)})


def _q_betweenness_copurchase(sf_dir):
    """Sampled Brandes betweenness from the 4 smallest part keys —
    graph.centrality (packed dist+sigma forward program, x-form
    backward program, shared worker pool)."""
    from pgd_ray.graph.centrality import betweenness_centrality

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seeds = np.argsort(vids)[:4]
    bc = betweenness_centrality(csr, seeds)
    return pd.DataFrame({"v": vids, "betweenness": np.round(bc, 6)})


def _q_ego_copurchase(sf_dir):
    """2-hop ego subgraph around the smallest part key — graph.ego
    (BFS capped at k rounds + broadcast-mask induced-edge filter)."""
    from pgd_ray.graph.ego import ego_subgraph

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seed = int(np.argmin(vids))
    edges, members = ego_subgraph(dense, csr, [seed], k=2)
    df = edges.to_pandas()
    df["src"] = vids[df["src"].to_numpy()]
    df["dst"] = vids[df["dst"].to_numpy()]
    lo = np.minimum(df["src"], df["dst"])
    hi = np.maximum(df["src"], df["dst"])
    return pd.DataFrame({"src": lo, "dst": hi})


def _q_ppr_copurchase(sf_dir):
    from pgd_ray.graph.iterative import personalized_pagerank

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    seed = int(np.argmin(vids))
    ppr = personalized_pagerank(csr, seed, tol=1e-15, max_iter=400)
    return pd.DataFrame({"v": vids, "score": np.round(ppr, 9)})


def _q_label_prop_tool(sf_dir):
    from pgd_ray.graph.iterative import label_propagation

    eds, csr, vocab = _tool_graph(sf_dir)
    lab = label_propagation(csr, max_iter=20)
    return pd.DataFrame({"tool_id": np.arange(csr.n, dtype=np.int64),
                         "label": lab.astype(np.int64)})


def _q_modularity_tool(sf_dir):
    """Per-community Newman modularity of the LP labeling on the tool
    graph — graph.community (edge-side term distributed, label vector
    broadcast once)."""
    from pgd_ray.graph.community import modularity_by_label
    from pgd_ray.graph.iterative import label_propagation

    eds, csr, vocab = _tool_graph(sf_dir)
    lab = label_propagation(csr, max_iter=20)
    return modularity_by_label(eds, csr, lab)


def _q_text_stats(sf_dir):
    import ray.data

    from pgd_ray.text.analysis import text_stats

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text_stats(docs)


def _q_fingerprints(sf_dir):
    import ray.data

    from pgd_ray.text.analysis import fingerprints

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprints(docs).select_columns(["doc_id", "md5"])


def _q_exact_dedup(sf_dir):
    import ray.data

    from pgd_ray.text.dedup import exact_dedup

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(docs)


def _q_segment_dedup(sf_dir):
    """Exact span dedup: aligned 8-word segments, global
    first-occurrence keep in (doc_id, seg_idx) order, docs rebuilt
    from survivors — text.segdedup (explode -> Min(pos) groupby ->
    sorted-block rebuild)."""
    from pgd_ray.text.segdedup import segment_dedup_docs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return segment_dedup_docs(docs, seg_words=8)


def _q_lang_id(sf_dir):
    import ray.data

    from pgd_ray.text.analysis import lang_id

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(docs)


def _q_minhash_dedup(sf_dir):
    import ray.data

    from pgd_ray.text.dedup import minhash_lsh_dedup

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs, threshold=0.7)


def _q_clean_corpus(sf_dir):
    """Composed hygiene pipeline: lang+quality filter, exact dedup,
    MinHash near-dedup — see pgd_ray.pipelines.clean_corpus."""
    from pgd_ray.pipelines.clean_corpus import clean_corpus

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return clean_corpus(docs)


def _q_simhash_pairs(sf_dir):
    import ray.data

    from pgd_ray.text.dedup import simhash_dedup

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup(docs, max_hamming=3)


def _q_ngram_jaccard(sf_dir):
    """Exact char-5-gram Jaccard ≥ 0.45 pairs via banded LSH candidates
    + distributed exact verification (recall bound 5.2e-7 miss/pair at
    the threshold — see pgd_ray.text.dedup.ngram_jaccard_pairs)."""
    import ray.data

    from pgd_ray.text.dedup import ngram_jaccard_pairs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, k=5, threshold=0.45)


def _q_topk_cosine(sf_dir):
    import ray.data

    from pgd_ray.stages.similarity import topk_cosine

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    top = topk_cosine(emb, q, k=10, dtype=np.float64)
    top["cosine"] = top["cosine"].round(6)
    return top


def _q_ivf_topk(sf_dir):
    """IVF ANN in its exact configuration (nprobe == n_centroids: every
    bucket probed, so the trained codebook cannot drop a candidate) —
    exercises the full train/assign/probe/merge machinery against the
    brute-force SQL oracle."""
    import ray.data

    from pgd_ray.stages.similarity import ivf_topk_cosine

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    top = ivf_topk_cosine(emb, q, k=10, n_centroids=8, nprobe=8, dtype=np.float64)
    top["cosine"] = top["cosine"].round(6)
    return top


def _q_quantization_error(sf_dir):
    """Int8 scalar-quantization round-trip error per vector —
    stages.quantization (d-row range partials, broadcast (mn, scale),
    one streamed error pass; floor(x+0.5) contract on both sides)."""
    from pgd_ray.stages.quantization import quantization_error

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = quantization_error(emb).to_pandas()
    out["sse"] = out["sse"].round(9)
    out["max_abs_err"] = out["max_abs_err"].round(9)
    return out


def _q_mmr_rerank(sf_dir):
    """MMR diversified top-5 (lambda=0.7) against the vec_id-0 query —
    stages.similarity.mmr_rerank (k distributed argmax passes, selected
    set broadcast per round); the oracle unrolls the greedy recurrence
    as 5 chained CTE stages."""
    from pgd_ray.stages.similarity import mmr_rerank

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(
        emb.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0],
        np.float64)
    out = mmr_rerank(emb.filter(expr="vec_id != 0"), q, k=5, lam=0.7,
                     dtype=np.float64)
    out["score"] = out["score"].round(6)
    return out


def _q_embedding_neardup(sf_dir):
    import ray.data

    from pgd_ray.text.dedup import embedding_neardup

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_neardup(emb, threshold=0.45, dtype=np.float64)
    out["cosine"] = out["cosine"].round(6)
    return out


def _q_kmeans_embeddings(sf_dir):
    """Deterministic Lloyd k-means over the embedding table —
    stages.clustering (broadcast centroids, k x d partial-sum shuffle
    per iteration)."""
    from pgd_ray.stages.clustering import kmeans_fit

    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    assign, _ = kmeans_fit(emb, k=8, iters=4)
    return assign


def _q_semdedup(sf_dir):
    """SemDeDup: k-means clusters, then within-cluster cosine
    components; keep = smallest vec_id per component —
    stages.clustering."""
    from pgd_ray.stages.clustering import semdedup

    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    return semdedup(emb, k=8, iters=4, threshold=0.45)


def _q_univar_clique4(sf_dir):
    from pgd_ray.graph.graphlets import graphlet_micro
    from pgd_ray.stages.univar import univar_stats

    eds, csr, vocab = _tool_graph(sf_dir)
    micro = graphlet_micro(eds, csr, concurrency=(1, 4))
    st = univar_stats(micro, "clique4")
    # round 6 both sides: mean/var are exact integer ratios (identical
    # in SQL), rounding only guards the float hash comparison
    return pd.DataFrame([{k: round(float(v), 6) for k, v in st.items()}])


def _q_vertex_triangles(sf_dir):
    from pgd_ray.graph.graphlets import vertex_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    df = vertex_triangles(dense, csr.range_csr or csr).to_pandas()
    df["v"] = vids[df["v"].to_numpy()]
    return df[["v", "triangles"]]


_Q1_CUTOFF_US = 936_230_400_000_000   # 1999-09-02T00:00Z
_Q3_CUTOFF_US = 899_164_800_000_000   # 1998-06-30T00:00Z


def _q_tpch_q1(sf_dir):
    """TPC-H Q1 pricing summary — pipelines.tpch.q1 (partial
    aggregation inside map_batches; monetary sums rounded to cents)."""
    from pgd_ray.pipelines.tpch import q1

    return q1(sf_dir, cutoff_us=_Q1_CUTOFF_US)


def _q_tpch_q3(sf_dir):
    """TPC-H Q3 shipping priority — pipelines.tpch.q3 (two native
    hash joins partitioned on the key + distributed ordered head)."""
    from pgd_ray.pipelines.tpch import q3

    return q3(sf_dir, cutoff_us=_Q3_CUTOFF_US, segment="BUILDING", k=10)


_Q5_LO_US = 820_454_400_000_000   # 1996-01-01T00:00Z
_Q5_HI_US = 852_076_800_000_000   # 1997-01-01T00:00Z


def _q_tpch_q5(sf_dir):
    """TPC-H Q5 local-supplier volume — pipelines.tpch.q5 (ONE shuffle
    join for the two big tables; all four dimension tables broadcast
    as dense lookup arrays)."""
    from pgd_ray.pipelines.tpch import q5

    return q5(sf_dir, region="ASIA", date_lo_us=_Q5_LO_US,
              date_hi_us=_Q5_HI_US)


def _q_tpch_q6(sf_dir):
    """TPC-H Q6 forecast revenue change — pipelines.tpch.q6 (filter +
    one global sum; per-batch partials, no shuffle)."""
    from pgd_ray.pipelines.tpch import q6

    return q6(sf_dir, date_lo_us=_Q5_LO_US, date_hi_us=_Q5_HI_US,
              disc_lo=0.04, disc_hi=0.06, qty_below=24.0)


_Q8_HI_US = 883_612_800_000_000   # 1998-01-01T00:00Z
_Q15_HI_US = 828_316_800_000_000  # 1996-04-01T00:00Z


def _q_tpch_q8(sf_dir):
    """TPC-H Q8 national market share — pipelines.tpch.q8 (one shuffle
    join; part/supplier/customer/nation/region broadcast)."""
    from pgd_ray.pipelines.tpch import q8

    return q8(sf_dir, nation="NATION_2", region="ASIA", ptype="ECONOMY",
              date_lo_us=_Q5_LO_US, date_hi_us=_Q8_HI_US)


def _q_tpch_q15(sf_dir):
    """TPC-H Q15 top supplier — pipelines.tpch.q15 (partial per-batch
    sums, tiny groupby, O(#ties) driver head)."""
    from pgd_ray.pipelines.tpch import q15

    return q15(sf_dir, date_lo_us=_Q5_LO_US, date_hi_us=_Q15_HI_US)


def _q_tpch_q17(sf_dir):
    """TPC-H Q17 small-quantity revenue (brand-only predicate — the
    slim schema has no p_container) — pipelines.tpch.q17 (two passes
    over the brand's lineitems, O(#brand parts) broadcast threshold)."""
    from pgd_ray.pipelines.tpch import q17

    return q17(sf_dir, brand="Brand#1")


def _q_tpch_q19(sf_dir):
    """TPC-H Q19 disjunctive brand/size/quantity revenue (slim schema:
    no container/shipmode) — pipelines.tpch.q19 (broadcast part
    attribute arrays, vectorized OR-of-ANDs mask, zero shuffles)."""
    from pgd_ray.pipelines.tpch import q19

    return q19(sf_dir)


def _q_tpch_q21(sf_dir):
    """TPC-H Q21 shape (only supplier with a returned lineitem on a
    multi-supplier order; slim schema has no commit/receipt dates) —
    pipelines.tpch.q21 (distinct-pair + per-order hash aggregates,
    broadcast qualifying-order key array)."""
    from pgd_ray.pipelines.tpch import q21

    return q21(sf_dir, top=20)


def _q_tpch_q22(sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no
    high-value order, grouped by cntrycode = c_custkey % 10 —
    pipelines.tpch.q22 (scalar-subquery aggregate + broadcast
    anti-join + tiny group agg)."""
    from pgd_ray.pipelines.tpch import q22

    return q22(sf_dir)


def _q_tpch_q2(sf_dir):
    """TPC-H Q2 shape: minimum-cost supplier per qualifying part
    (lineitem distinct pairs stand in for partsupp; min extendedprice
    is the supply cost) — pipelines.tpch.q2 (broadcast dimension
    arrays, one lineitem scan with per-batch pair-min partials, tiny
    two-key groupby, driver argmin over O(#pairs))."""
    from pgd_ray.pipelines.tpch import q2

    return q2(sf_dir)


def _q_tpch_q9(sf_dir):
    """TPC-H Q9 shape: discounted-revenue profit by supplier nation
    and order year for name-matched parts — pipelines.tpch.q9
    (broadcast part/supplier dims, one lineitem⋈orders shuffle join,
    per-batch (nation, year) partials)."""
    from pgd_ray.pipelines.tpch import q9

    return q9(sf_dir)


def _q_tpch_q11(sf_dir):
    """TPC-H Q11 shape: per-part shipped-quantity value for one
    nation's suppliers, kept above a fraction of the global total —
    pipelines.tpch.q11 (broadcast supplier bool, per-part partial
    sums, driver threshold over O(#parts))."""
    from pgd_ray.pipelines.tpch import q11

    return q11(sf_dir)


def _q_tpch_q16(sf_dir):
    """TPC-H Q16 shape: distinct-supplier count per (brand, type,
    size) excluding one brand/type and mod-coded "complaint"
    suppliers — pipelines.tpch.q16 (broadcast part attributes,
    per-batch distinct pairs, global pair dedup groupby)."""
    from pgd_ray.pipelines.tpch import q16

    return q16(sf_dir)


def _q_tpch_q20(sf_dir):
    """TPC-H Q20 shape: suppliers of name-matched parts whose windowed
    shipped quantity per pair exceeds a threshold, restricted to one
    nation — pipelines.tpch.q20 (two broadcast bools, windowed scan
    with pair partials, driver distinct + decorate)."""
    from pgd_ray.pipelines.tpch import q20

    return q20(sf_dir)


def _q_textrank(sf_dir):
    """TextRank keywords: engine PageRank over the adjacent-token
    co-occurrence graph of the top-200 vocabulary —
    text.textrank.textrank_keywords (vocab_topk shuffle + one distinct
    pair groupby + the iterative engine at its float64 fixpoint)."""
    import ray.data

    from pgd_ray.text.textrank import textrank_keywords

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return textrank_keywords(docs, vocab_size=200)


def _q_vertex_orbits4_tool(sf_dir):
    """Per-vertex 4-clique / 4-cycle membership counts on the tool
    graph, aggregated from the reference's per-edge micro counts with
    the automorphism multiplicities (a vertex lies on 3 incident
    edges of each of its 4-cliques, 2 of each of its 4-cycles) —
    graph.graphlets.graphlet_micro + one vectorized vertex fold."""
    from pgd_ray.graph.graphlets import graphlet_micro

    eds, csr, vocab = _tool_graph(sf_dir)
    mi = graphlet_micro(eds, csr).to_pandas()
    up = pd.concat([
        mi[["src", "clique4", "cycle4"]].rename(columns={"src": "v"}),
        mi[["dst", "clique4", "cycle4"]].rename(columns={"dst": "v"}),
    ])
    agg = up.groupby("v", sort=True).sum()
    return pd.DataFrame({
        "v": agg.index.to_numpy(np.int64),
        "clique4": (agg["clique4"].to_numpy(np.int64) // 3),
        "cycle4": (agg["cycle4"].to_numpy(np.int64) // 2),
    })


def _q_orbit_spearman(sf_dir):
    """Graphlet correlation matrix (k=3 orbits, Spearman) —
    graph.graphlets.orbit_spearman (exact integer 2·rank moments)."""
    from pgd_ray.graph.graphlets import orbit_spearman

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return orbit_spearman(dense, csr.range_csr or csr)


def _q_vertex_orbits3(sf_dir):
    """Per-vertex 3-node graphlet orbit vector (GDV k=3) —
    graph.graphlets.vertex_orbits3 (signature triangle kernel +
    one neighbor-degree-sum pass)."""
    from pgd_ray.graph.graphlets import vertex_orbits3

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    df = vertex_orbits3(dense, csr.range_csr or csr).to_pandas()
    df["v"] = vids[df["v"].to_numpy()]
    return df.sort_values("v", ignore_index=True)


def _q_conv_profile(sf_dir):
    """Per-conversation shape stats over the transcript table —
    stages.conv_stats.conv_profile (three hash aggregations, exact
    two-step distincts; driver holds O(#conversations) = the output)."""
    from pgd_ray.stages.conv_stats import conv_profile

    return conv_profile(_transcripts_ds(sf_dir))


def _q_response_latency(sf_dir):
    """Mean inter-turn gap by responding role —
    stages.conv_stats.response_latency (one (conv, turn) sort,
    per-block pairs, ≤1 boundary pair per block stitched)."""
    from pgd_ray.stages.conv_stats import response_latency

    return response_latency(_transcripts_ds(sf_dir))


def _q_table_diff_events(sf_dir):
    """Snapshot diff (added/removed/changed/unchanged) between the
    events table and a deterministically mutated copy (drop
    event_id%97==0, mutate props where %101==0, add shifted rows for
    %103==0) — stages.diff.table_diff (per-side (key, md5) collapse +
    ONE full-outer hash join)."""
    import pyarrow as pa

    import ray.data
    from pgd_ray.stages.diff import table_diff
    from pgd_ray.util import read_parquet_clean

    cols = ["event_type", "props"]
    old = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", *cols])

    def mutate(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = eid % 97 != 0
        eidk = eid[keep]
        et = t["event_type"].to_numpy(zero_copy_only=False)[keep]
        pr = t["props"].to_numpy(zero_copy_only=False)[keep].astype(object)
        pr = np.where(eidk % 101 == 0, "MUTATED", pr)
        add = eidk % 103 == 0
        return pa.table({
            "event_id": pa.array(
                np.concatenate([eidk, eidk[add] + 1_000_000_000]),
                pa.int64()),
            "event_type": pa.array(
                np.concatenate([et, et[add]]), pa.string()),
            "props": pa.array(
                np.concatenate([pr, pr[add]]).astype(object), pa.string()),
        })

    new = old.map_batches(mutate, batch_format="pyarrow")
    return table_diff(old, new, "event_id", cols)


def _q_key_skew(sf_dir):
    """Hash-bucket skew diagnostic over user_id (the shuffle-planning
    signal): 64-bucket splitmix histogram, one hash aggregate."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    from pgd_ray.text.hashing import splitmix64
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def keyed(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(u) % np.uint64(64)).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64())})

    out = (ev.map_batches(keyed, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Count(alias_name="n"))
           .to_pandas())
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bucket", ignore_index=True)


def _q_profile_events(sf_dir):
    """Per-column data-quality audit of the events table —
    stages.profile.table_profile (one null-count pass + the two-step
    exact distinct per column)."""
    import ray.data

    from pgd_ray.stages.profile import table_profile

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    return table_profile(
        ev, ["event_id", "ts", "user_id", "event_type", "value", "props"])


def _q_conv_docs(sf_dir):
    """Conversation → training-document conversion (turn texts joined
    in stable order) — stages.conv_stats.conversations_to_documents
    (interior convs stay a Dataset; ≤2 boundary fragments per block
    stitched)."""
    from pgd_ray.stages.conv_stats import conversations_to_documents

    return conversations_to_documents(_transcripts_ds(sf_dir))


def _q_tool_transitions(sf_dir):
    """Tool-call transition matrix within conversations —
    stages.conv_stats.tool_transitions (sorted blocks, ≤1 boundary
    pair per block stitched)."""
    from pgd_ray.stages.conv_stats import tool_transitions

    return tool_transitions(_transcripts_ds(sf_dir))


def _q_boilerplate(sf_dir):
    """Per-document boilerplate-line fraction (corpus-duplicated
    lines) — text.boilerplate.boilerplate_lines (distinct-pair
    partials, one line groupby, broadcast dup set)."""
    import ray.data

    from pgd_ray.text.boilerplate import boilerplate_lines

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return boilerplate_lines(docs, min_docs=2)


def _q_motif_significance(sf_dir):
    """Triangle significance vs the configuration-model null —
    graph.graphlets.motif_significance (degree-moment closed form +
    the signature triangle kernel)."""
    from pgd_ray.graph.graphlets import motif_significance

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return motif_significance(dense, csr.range_csr or csr)


def _q_rfm(sf_dir):
    """RFM customer segmentation with exact distributed NTILE(5) —
    stages.rfm.rfm_segments (one per-customer groupby + three
    global_ntile sort-and-offset passes)."""
    from pgd_ray.stages.rfm import rfm_segments

    return rfm_segments(sf_dir, k=5)


def _q_hopkins(sf_dir):
    """Hopkins clusterability statistic over the embedding table —
    stages.vector_stats.hopkins_statistic (broadcast 2m probes,
    per-batch local-min partials, #batches×2m driver min-combine)."""
    import ray.data

    from pgd_ray.stages.vector_stats import hopkins_statistic

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return hopkins_statistic(ds, m=20)


def _q_hard_negatives(sf_dir):
    """Deterministic hard-negative mining (per-probe top-k nearest
    with a different label) — stages.vector_stats.hard_negatives."""
    import ray.data

    from pgd_ray.stages.vector_stats import hard_negatives

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return hard_negatives(ds, m=10, k=5)


def _q_rake(sf_dir):
    """RAKE keyphrases (deg/freq word scores over stopword-delimited
    candidate phrases) — text.rake.rake_keyphrases (one corpus scan
    emitting tagged word/phrase partials; vocab-sized driver tail)."""
    import ray.data

    from pgd_ray.text.rake import rake_keyphrases

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return rake_keyphrases(docs, top_k=100)


def _q_degree_gini(sf_dir):
    """Exact Gini coefficient of the degree distribution from the
    degree HISTOGRAM (O(#distinct degrees) driver rows, no global
    sort) — graph.degrees.degree_gini."""
    from pgd_ray.graph.degrees import degree_gini
    from pgd_ray.sources.edges import edges_copurchase

    return degree_gini(edges_copurchase(sf_dir))


def _q_bigram_lm(sf_dir):
    """Self-trained bigram-LM quality score per document —
    text.lm.bigram_lm_score (pass 1: partial-combined bigram counts,
    one exchange; pass 2: broadcast count table + searchsorted
    lookups, no second shuffle)."""
    from pgd_ray.text.lm import bigram_lm_score

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_lm_score(docs).to_pandas()


def _q_curate_corpus(sf_dir):
    """End-to-end curation: clean_corpus_ds -> decontamination filter
    -> distributed sequence packing, Dataset-out —
    pipelines.curate.curate_corpus; the oracle splices the
    clean/decontam/pack mirrors into one chain."""
    import pyarrow as pa

    from pgd_ray.pipelines.curate import curate_corpus

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
        )),
        batch_format="pyarrow",
    )
    return curate_corpus(docs, bench).to_pandas().sort_values(
        "doc_id", ignore_index=True)


def _q_decontaminate(sf_dir):
    """Benchmark decontamination: docs sharing any token 8-gram with
    the benchmark slice (doc_id % 50 == 0) are flagged —
    text.decontam.decontaminate (driver state ∝ eval set; one scan,
    no shuffle)."""
    import pyarrow as pa

    from pgd_ray.text.decontam import decontaminate

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
        )),
        batch_format="pyarrow",
    )
    return decontaminate(docs, bench, n=8).to_pandas()


def _q_tfidf_top5(sf_dir):
    """Per-doc top-5 TF-IDF terms — text.tfidf.tfidf_top_terms (df
    pass + broadcast table + factorized scoring scan; deterministic
    (tfidf DESC, term) cutoff)."""
    from pgd_ray.text.tfidf import tfidf_top_terms

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=5).to_pandas()


def _q_bm25_rank(sf_dir):
    """Okapi BM25 top-20 docs for a fixed query — text.bm25 (two
    streaming passes: df+length partials, broadcast-idf scoring)."""
    from pgd_ray.text.bm25 import bm25_rank

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_rank(docs, ["table", "sort", "hash"], k=20)


def _q_cooccurrence(sf_dir):
    """Windowed self-join: same-user event-type pairs within 5 min —
    stages.windows.cooccurrence_pairs (sorted blocks + boundary-user
    stitch; expansion ∝ window occupancy, never all-pairs)."""
    from pgd_ray.stages.windows import cooccurrence_pairs

    return cooccurrence_pairs(sf_dir, window_us=300_000_000)


def _q_lexical_diversity(sf_dir):
    """Per-doc unigram entropy / Simpson / type-token ratio —
    text.entropy.lexical_diversity (one streamed pass, token histogram
    per doc, no shuffle)."""
    from pgd_ray.text.entropy import lexical_diversity

    from pgd_ray.util import round_half_away

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = lexical_diversity(docs).to_pandas()
    for c in ("entropy", "simpson", "ttr"):
        # SQL ROUND ties half AWAY from zero; numpy rounds half-even —
        # exact .5 ties at digit 6 otherwise mismatch (seen at sf0.01)
        out[c] = round_half_away(out[c], 6)
    return out


def _q_user_activity(sf_dir):
    """Per-user RFM-style features — stages.features
    .user_activity_features (one hash aggregation + the two-level
    exact-distinct breadth, small self-join)."""
    from pgd_ray.stages.features import user_activity_features

    from pgd_ray.util import round_half_away

    out = user_activity_features(sf_dir).to_pandas()
    out["total_value"] = round_half_away(out["total_value"], 6)
    out["mean_value"] = round_half_away(out["mean_value"], 6)
    return out.astype({"n_events": np.int64, "n_types": np.int64})


def _q_weighted_sample(sf_dir):
    """Deterministic A-ES weighted sample (k=50, weight = n_chars) —
    text.sampling.weighted_sample_topk; keys are a pure splitmix64
    function of doc_id so the SQL mirror replays the exact draw."""
    from pgd_ray.text.sampling import weighted_sample_topk

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    out = weighted_sample_topk(docs, k=50, weight_col="n_chars")
    out["score"] = out["score"].round(6)
    return out


def _q_trigrams(sf_dir):
    """Ordered event-type trigrams per user — stages.windows
    .trigram_counts (sorted blocks, double shift-compare, boundary
    stitch)."""
    from pgd_ray.stages.windows import trigram_counts

    return trigram_counts(sf_dir)


def _q_degree_histogram(sf_dir):
    """Log2-binned degree histogram — graph.degrees
    .degree_histogram_log2 over the distributed degree table."""
    from pgd_ray.graph.degrees import degree_histogram_log2, degree_table

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    out = degree_histogram_log2(degree_table(eds)).to_pandas()
    return out.astype({"bin": np.int64, "n_vertices": np.int64})


def _q_hill_alpha(sf_dir):
    """Hill power-law tail estimator at d_min=64 — graph.degrees
    .hill_alpha (one pass of (k, Σ ln d) partials)."""
    from pgd_ray.graph.degrees import degree_table, hill_alpha

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return hill_alpha(degree_table(eds), d_min=64)


def _q_grouped_quantiles(sf_dir):
    """Per-event-type exact p50/p90 of value — stages.quantiles
    .grouped_quantiles (group-aware histogram refinement: one shared
    streamed pass per round serves every group's live intervals; no
    sort anywhere)."""
    from pgd_ray.stages.quantiles import grouped_quantiles

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value", [0.5, 0.9])


def _q_mad_outliers(sf_dir):
    """Per-event-type robust outlier screen — stages.robust
    .mad_outliers (exact rank-rule median + MAD via the shared-pass
    grouped-quantile refinement, strict |x-med| > 3*MAD flags; the
    identical IEEE expression in the SQL mirror)."""
    from pgd_ray.stages.robust import mad_outliers

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = mad_outliers(ev, "event_type", "value", thresh=3.0)
    out["med"] = out["med"].round(9)
    out["mad"] = out["mad"].round(9)
    return out


def _q_zipf_slope(sf_dir):
    """Zipf rank-frequency exponent over the top-100 vocabulary —
    text.analysis.zipf_slope (one vocab shuffle, closed-form OLS on n
    driver rows)."""
    from pgd_ray.text.analysis import zipf_slope

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return zipf_slope(docs, n=100)


def _q_kmv_events(sf_dir):
    """KMV bottom-k distinct sketch over event_id (k=256) —
    stages.kmv.kmv_distinct (per-batch bottom-k, #blocks×k driver
    merge; integer-exact through the k-th minimum)."""
    from pgd_ray.stages.kmv import kmv_distinct

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id"])
    return kmv_distinct(ev, "event_id", k=256)


def _q_transitions(sf_dir):
    """Markov transition bigrams: consecutive same-user event-type
    pairs in (ts, event_id) order — stages.windows.transition_counts
    (sorted blocks, adjacent-shift compare, boundary-user stitch)."""
    from pgd_ray.stages.windows import transition_counts

    return transition_counts(sf_dir)


def _q_local_cc(sf_dir):
    """Per-vertex local clustering coefficient on the copurchase graph
    — graph.graphlets.local_clustering (vertex_triangles + broadcast
    degree lookup)."""
    from pgd_ray.graph.graphlets import local_clustering

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    df = local_clustering(dense, csr).to_pandas()
    df["v"] = vids[df["v"].to_numpy()]
    return df[["v", "degree", "triangles", "local_cc"]]


def _q_funnel_events(sf_dir):
    """view -> click -> purchase ordered funnel — stages.funnel (one
    filtered scan per step, shrinking per-user broadcast)."""
    from pgd_ray.stages.funnel import funnel_counts

    ev = _read(f"{sf_dir}/events.parquet",
               columns=["user_id", "event_type", "ts"])
    return funnel_counts(ev, ["view", "click", "purchase"])


def _q_tumbling_counts(sf_dir):
    from pgd_ray.stages.windows import tumbling_counts

    # exact_cents already emits round_half_away(…, 6) — no pandas
    # half-even re-round on top (ADVICE r4)
    return tumbling_counts(sf_dir, exact_cents=True).to_pandas()


def _q_sessions(sf_dir):
    from pgd_ray.stages.windows import sessionize

    return sessionize(sf_dir)


def _q_window_functions(sf_dir):
    """Per-user SQL window trio (row_number / cumulative sum / lag)
    over the event stream — stages.windows.window_functions (one sort,
    O(#blocks) driver carry, vectorized second pass)."""
    from pgd_ray.stages.windows import window_functions
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])
    return window_functions(ev, key="user_id", order="event_id",
                            value="value")


def _q_tpch_q4(sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join (orders having a returned
    lineitem) via the distributed distinct-key hash join path —
    pipelines.tpch.q4 / stages.joins.semi_join."""
    from pgd_ray.pipelines.tpch import q4

    # [1996-01-01, 1998-01-01) in epoch-us
    return q4(sf_dir, date_lo_us=820_454_400_000_000,
              date_hi_us=883_612_800_000_000)


def _q_cust_no_orders(sf_dir):
    """NOT EXISTS anti-join: customers with no URGENT order, counted
    per market segment — stages.joins.anti_join (broadcast
    distinct-key strategy: customer is big, the distinct urgent
    o_custkey set is small)."""
    from ray.data.aggregate import Count

    from pgd_ray.stages.joins import anti_join
    from pgd_ray.util import read_parquet_clean

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    left = anti_join(cust, orders, left_key="c_custkey",
                     right_key="o_custkey", strategy="broadcast")
    df = left.groupby("c_mktsegment").aggregate(
        Count(alias_name="customers")).to_pandas()
    df["customers"] = df["customers"].astype("int64")
    return df.sort_values("c_mktsegment", ignore_index=True)


def _q_normalize_text(sf_dir):
    """Canonical text normalization (lowercase, whitespace collapse,
    trim) — the first stage of every cleaning pipeline; vectorized
    pandas C kernels, mirrored by lower/regexp_replace/trim."""
    import re

    import pandas as pd

    from pgd_ray.util import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    ws = re.compile(r"\s+", re.ASCII)

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        t = (b["text"].fillna("").str.lower()
             .str.replace(ws, " ", regex=True).str.strip())
        return pd.DataFrame({"doc_id": b["doc_id"], "norm_text": t,
                             "n_chars": t.str.len().astype("int64")})

    return docs.map_batches(norm, batch_format="pandas", batch_size=4096)


def _q_value_histogram(sf_dir):
    """Fixed-width histogram of events.value (20 bins over [0, 200);
    out-of-range clamped into the edge bins) — per-batch bincount
    partials, one tiny groupby."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    nb, lo, hi = 20, 0.0, 200.0
    w = (hi - lo) / nb

    def part(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) // w).astype(np.int64), 0, nb - 1)
        bc = np.bincount(b, minlength=nb)
        return pa.table({"bin": np.arange(nb, dtype=np.int64),
                         "n": bc.astype(np.int64)})

    agg = (ev.map_batches(part, batch_format="pyarrow", batch_size=65536)
           .groupby("bin").aggregate(Sum("n", alias_name="n_events"))
           .to_pandas().sort_values("bin", ignore_index=True))
    agg = agg[agg["n_events"] > 0].reset_index(drop=True)
    agg["lo"] = np.round(agg["bin"] * w + lo, 6)
    agg["n_events"] = agg["n_events"].astype("int64")
    return agg[["bin", "lo", "n_events"]]


def _q_returnflag_corr(sf_dir):
    """Per-group Pearson correlation of (l_quantity, l_extendedprice)
    from one pass of distributed moment partials (n, Σx, Σy, Σxy,
    Σx², Σy² per group) — never the rows."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def part(t: pa.Table) -> pa.Table:
        import pandas as pd

        x = t["l_quantity"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "g": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "n": 1.0, "sx": x, "sy": y, "sxy": x * y,
            "sxx": x * x, "syy": y * y,
        })
        return pa.Table.from_pandas(df.groupby("g", as_index=False).sum(),
                                    preserve_index=False)

    agg = (li.map_batches(part, batch_format="pyarrow", batch_size=65536)
           .groupby("g").aggregate(*[Sum(c, alias_name=c + "_")
                                     for c in ("n", "sx", "sy", "sxy",
                                               "sxx", "syy")])
           .to_pandas().sort_values("g", ignore_index=True))
    n = agg["n_"]
    cov = agg["sxy_"] - agg["sx_"] * agg["sy_"] / n
    vx = agg["sxx_"] - agg["sx_"] ** 2 / n
    vy = agg["syy_"] - agg["sy_"] ** 2 / n
    return pd.DataFrame({
        "l_returnflag": agg["g"],
        "n": n.astype("int64"),
        "corr": np.round(cov / np.sqrt(vx * vy), 6),
    })


def _q_pii_scan(sf_dir):
    """PII scan + redaction on documents with deterministically
    INJECTED synthetic PII (the corpus has none): doc_id%3 gains an
    email, %5 a phone, %7 an IPv4 — injection is mirrored in the SQL
    so counts AND the redacted text hash-match (text/pii.py)."""
    import numpy as np
    import pandas as pd

    from pgd_ray.text.pii import pii_scan
    from pgd_ray.util import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy()
        ds = pd.Series(d.astype(str), index=b.index)
        txt = b["text"].fillna("")
        txt = txt + np.where(d % 3 == 0, " reach user" + ds + "@example.com now", "")
        txt = txt + np.where(d % 5 == 0,
                             " call 415-555-" + pd.Series(d % 10000, index=b.index).astype(str).str.zfill(4), "")
        txt = txt + np.where(d % 7 == 0,
                             " from 10." + pd.Series(d % 256, index=b.index).astype(str) + ".0.1", "")
        return pd.DataFrame({"doc_id": b["doc_id"], "text": txt})

    return pii_scan(docs.map_batches(inject, batch_format="pandas"))


def _q_chunk_docs(sf_dir):
    """Overlapping token-window chunking (64-token chunks, 16
    overlap) — text/chunking.py; chunk text is the token slice
    space-joined, mirrored by list_slice/array_to_string in SQL."""
    from pgd_ray.text.chunking import chunk_documents
    from pgd_ray.util import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


def _q_tpch_q10(sf_dir):
    """TPC-H Q10 shape: returned-item revenue top-20 — one big⋈big
    hash join, per-custkey pre-aggregation, customer/nation broadcast
    decorate — pipelines.tpch.q10."""
    from pgd_ray.pipelines.tpch import q10

    return q10(sf_dir, date_lo_us=820_454_400_000_000,
               date_hi_us=852_076_800_000_000)


def _q_tpch_q18(sf_dir):
    """TPC-H Q18 shape: large-volume orders (HAVING sum(qty) > 250) —
    per-orderkey hash aggregate, distributed join to orders, broadcast
    customer decorate — pipelines.tpch.q18."""
    from pgd_ray.pipelines.tpch import q18

    return q18(sf_dir, qty_over=250.0, k=100)


def _q_tpch_q13(sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — NO join
    (per-customer count histogram + a scalar zero-bucket) —
    pipelines.tpch.q13."""
    from pgd_ray.pipelines.tpch import q13

    return q13(sf_dir)


def _q_tpch_q7(sf_dir):
    """TPC-H Q7 shape: cross-nation shipping volume by year — one
    big⋈big join, dimension broadcast — pipelines.tpch.q7."""
    from pgd_ray.pipelines.tpch import q7

    return q7(sf_dir)


def _q_tpch_q12(sf_dir):
    """TPC-H Q12 shape: conditional aggregation over one distributed
    hash join of the two big tables — pipelines.tpch.q12."""
    from pgd_ray.pipelines.tpch import q12

    return q12(sf_dir, date_lo_us=820_454_400_000_000,
               date_hi_us=883_612_800_000_000)


def _q_tpch_q14(sf_dir):
    """TPC-H Q14 shape: promo revenue share via a broadcast dimension
    lookup (part never shuffles lineitem) — pipelines.tpch.q14."""
    from pgd_ray.pipelines.tpch import q14

    return q14(sf_dir, date_lo_us=820_454_400_000_000,
               date_hi_us=883_612_800_000_000)


def _q_event_type_stats(sf_dir):
    """Per-group numeric profile in one native hash-agg pass.  The
    moment sums run over EXACT integer cents (and cents², both int64)
    so sum/mean/std are reproducible bit-for-bit against the SQL
    mirror regardless of combine order — Ray's float Sum/Mean/Std and
    DuckDB's aggregates can land on opposite sides of the digit-6
    rounding boundary (the q7/q9 class)."""
    import numpy as np
    import pandas as pd
    import pyarrow as _pa

    from ray.data.aggregate import Count, Max, Min, Sum

    from pgd_ray.util import (int_sum_headroom, read_parquet_clean,
                              round_half_away)

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cents(t):
        c100 = np.rint(t["value"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        return _pa.table({"event_type": t["event_type"],
                          "value": t["value"],
                          "c100": _pa.array(c100, _pa.int64()),
                          "c2": _pa.array(c100 * c100, _pa.int64())})

    df = ev.map_batches(cents, batch_format="pyarrow").groupby(
        "event_type").aggregate(
        Count(alias_name="n"),
        Sum("c100", alias_name="s"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
        Sum("c2", alias_name="s2"),
    ).to_pandas().sort_values("event_type", ignore_index=True)
    df["n"] = df["n"].astype("int64")
    nf = df["n"].to_numpy(np.float64)
    # c100*c100 sums are the q1-ch6 overflow class (ADVICE r4): fail
    # loudly before int64 wraparound rather than silently diverge
    int_sum_headroom(df["s2"].to_numpy(np.int64), "event_type_stats s2")
    int_sum_headroom(df["s"].to_numpy(np.int64), "event_type_stats s")
    sf_ = df.pop("s").to_numpy(np.float64)
    s2f = df.pop("s2").to_numpy(np.float64)
    df["sum_value"] = round_half_away(sf_ / 100.0, 6)
    df["mean_value"] = round_half_away(sf_ / (100.0 * nf), 6)
    # sample std from the same exact sums, expression-identical to
    # the SQL mirror
    df["std_value"] = round_half_away(
        np.sqrt(np.maximum(s2f - sf_ * sf_ / nf, 0.0) / (nf - 1.0))
        / 100.0, 6)
    return df[["event_type", "n", "sum_value", "min_value", "max_value",
               "mean_value", "std_value"]]


def _q_cms_user_counts(sf_dir):
    """Count-Min sketch (4x128) of per-user event counts, point-queried
    for every distinct user — stages/cms.py; estimates are exact-min
    over splitmix-keyed rows, bit-mirrored in SQL."""
    from ray.data.aggregate import Count

    from pgd_ray.stages.cms import cms_estimate, cms_sketch
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    sk = cms_sketch(ev, "user_id", width=128, depth=4)
    users = ev.groupby("user_id").aggregate(
        Count(alias_name="_c")).drop_columns(["_c"]).materialize()
    return cms_estimate(users, "user_id", sk)


def _q_rolling_windows(sf_dir):
    """Per-user 5-row rolling sum/count/mean over the event stream —
    stages.windows.rolling_aggregate (sorted blocks, trailing-value
    carry across boundaries)."""
    from pgd_ray.stages.windows import rolling_aggregate
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])
    return rolling_aggregate(ev, key="user_id", order="event_id",
                             value="value", window=5)


def _q_retention(sf_dir):
    """Weekly cohort retention matrix — stages.retention
    (per-batch distinct combiner, two hash aggs, one hash join)."""
    from pgd_ray.stages.retention import cohort_retention
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    return cohort_retention(ev)


def _q_macro_approx_tool_graph(sf_dir):
    """Sampled graphlet estimator on the tool graph — the content-hash
    sampler makes even this APPROXIMATE operator bit-reproducible in
    SQL (oracle mirrors the same hash, threshold, 1/p scaling and
    closure)."""
    from pgd_ray.graph.graphlets import graphlet_macro_approx

    eds, csr, vocab = _tool_graph(sf_dir)
    mac = graphlet_macro_approx(eds, csr, fraction=0.1)
    return _macro_frame(mac)


def _q_media_decode(sf_dir):
    """Real image-decode round-trip: documents → real payloads
    (doc_id % 4 cycles 24-bit BMP / 8-bit PNG / baseline JPEG /
    progressive SOF2 JPEG — all pure-numpy codecs, stages/codecs.py)
    with dims derived from strlen(text) → actor-pool decode → dims.
    JPEG is lossy but its SOF dims are exact, so the closed-form dims
    oracle holds for all FOUR formats (see
    oracle_sql()['media_decode'])."""
    import ray.data

    from pgd_ray.stages.multimodal import decode_images, media_from_documents

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = media_from_documents(docs, payload_format="mixed4")
    return decode_images(media).select_columns(["media_id", "width", "height"])


def _q_asof_orders(sf_dir):
    """Each event joined to the user's most recent order as of the
    event time (broadcast strategy: orders is the dimension side).
    Ties on o_orderdate break to the min o_orderkey — deterministic."""
    from pgd_ray.stages.joins import asof_join

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        tiebreak="o_orderkey",
        right_cols=["o_orderkey", "o_totalprice"],
        right_time_as="asof_orderdate",
        how="inner", strategy="broadcast",
    )
    df = out.to_pandas().rename(
        columns={"o_orderkey": "asof_orderkey", "o_totalprice": "asof_totalprice"}
    )
    df["asof_totalprice"] = df["asof_totalprice"].round(6)
    return df[["event_id", "user_id", "ts", "asof_orderkey",
               "asof_totalprice", "asof_orderdate"]]


def _q_range_join_ship(sf_dir):
    """Interval join: every lineitem of an order shipped within 30 days
    of the order date (partitioned strategy: both sides shuffle once on
    the order-key hash)."""
    from pgd_ray.stages.joins import range_join

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber", "l_shipdate"],
    )
    out = range_join(
        orders, li,
        left_key="o_orderkey", right_key="l_orderkey",
        left_time="o_orderdate", right_time="l_shipdate",
        before_us=0, after_us=30 * 86_400_000_000,
        left_cols=["o_orderkey", "o_orderdate"],
        right_cols=["l_partkey", "l_linenumber"],
        right_time_as="ship_ts",
        strategy="partitioned", num_partitions=32,
    )
    return out.select_columns(
        ["o_orderkey", "o_orderdate", "l_partkey", "l_linenumber", "ship_ts"]
    )


def _q_hopping_counts(sf_dir):
    """Overlapping 1h windows hopping by 15min (each event lands in 4
    windows) — stages.windows.hopping_counts."""
    from pgd_ray.stages.windows import hopping_counts

    # exact_cents already emits round_half_away(…, 6) — no pandas
    # half-even re-round on top (ADVICE r4)
    return hopping_counts(sf_dir, exact_cents=True).to_pandas()


def _q_heavy_hitters(sf_dir):
    """Top-3 event types per user by count — stages.topn.heavy_hitters
    (sorted-block rank + boundary stitch; no map_groups)."""
    from pgd_ray.stages.topn import heavy_hitters

    return heavy_hitters(sf_dir, k=3)


def _q_sample_docs(sf_dir):
    """Deterministic 25% content-hash document sample —
    text.sampling.sample_by_hash (md5 16-bit prefix threshold)."""
    from pgd_ray.text.sampling import sample_by_hash

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    return sample_by_hash(docs, threshold_16bit=0x4000).select_columns(
        ["doc_id", "n_chars", "h4"]
    )


def _q_vocab_topk(sf_dir):
    """Corpus vocabulary: top-100 [A-Za-z]+ tokens by occurrence count
    (ties -> token asc) — text.analysis.vocab_topk."""
    from pgd_ray.text.analysis import vocab_topk

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_topk(docs, n=100)


def _q_quantiles_value(sf_dir):
    """Distributed EXACT quantiles of events.value with NO global sort
    (histogram-refinement rank selection) — stages.quantiles.
    bins/fetch_cap forced low so even sf0.001 exercises a refinement
    round."""
    from pgd_ray.stages.quantiles import exact_quantiles

    ev = _read(f"{sf_dir}/events.parquet", columns=["value"])
    df = exact_quantiles(
        ev, "value", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99],
        bins=64, fetch_cap=100,
    )
    df["value"] = df["value"].round(6)
    return df


def _q_distinct_users(sf_dir):
    """Exact COUNT(DISTINCT user_id) per event_type as two hash
    aggregations (combiner-friendly; no per-key value sets) —
    stages.distinct.grouped_distinct_count."""
    from pgd_ray.stages.distinct import grouped_distinct_count

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_distinct_count(ev, "event_type", "user_id", alias="n_users")


def _q_hll_users(sf_dir):
    """HyperLogLog register table (p=12) over events.user_id — the
    DISTRIBUTED sketch state is integer-deterministic and bit-exactly
    mirrored in SQL (splitmix64 + leading-zero rank via bin());
    stages.cardinality.  The float estimate stays driver-side
    (error-bound pytest)."""
    from pgd_ray.stages.cardinality import hll_registers

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_registers(ev, "user_id", p=12)


def _q_stratified_docs(sf_dir):
    """Per-language deterministic rebalancing: en kept at 25%, zh at
    75%, everything else at 50% — text.sampling.stratified_sample."""
    from pgd_ray.text.sampling import stratified_sample

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    out = stratified_sample(
        docs, "lang", {"en": 0x4000, "zh": 0xC000}, default_16bit=0x8000
    )
    return out.select_columns(["doc_id", "lang", "h4"])


def _q_cap_per_source(sf_dir):
    """At most 5 documents per source, drawn deterministically by
    (md5(text), doc_id) — text.sampling.cap_per_group over
    stages.topn.grouped_topk."""
    from pgd_ray.text.sampling import cap_per_group

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
    out = cap_per_group(docs, "source", 5, id_col="doc_id")
    return out.select_columns(["source", "doc_id", "md5", "rnk"])


def _q_pack_assignments(sf_dir):
    """GPT-style sequence packing (concatenate in doc_id order, cut
    every 1024 tokens) via a distributed prefix sum —
    text.packing.pack_assignments."""
    from pgd_ray.text.packing import pack_assignments

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_assignments(docs, pack_len=1024)


def _q_repetition_stats(sf_dir):
    """Gopher-style within-doc repetition signals + keep flag —
    text.analysis.repetition_stats."""
    from pgd_ray.text.analysis import repetition_stats

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(docs)


def _q_embedding_dim_stats(sf_dir):
    """Per-dimension moments of the embedding table (distributed
    partial sums; d tiny rows per batch shuffle) —
    stages.vector_stats.embedding_dim_stats."""
    from pgd_ray.stages.vector_stats import embedding_dim_stats

    em_ds = _read(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_dim_stats(em_ds)


def _event_halves(sf_dir):
    """(user_id, props.k) pairs split at the midpoint of the event-time
    range (µs int arithmetic so the boundary is bit-identical to the
    SQL mirror); returns (first_half, second_half) lazy Datasets.  The
    pair key is sparse in this corpus, so both INTERSECT and EXCEPT
    are non-degenerate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    ev = _read(f"{sf_dir}/events.parquet",
               columns=["user_id", "ts", "props"]).materialize()

    def to_pairs(t):
        k = (t["props"].to_pandas()
             .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
             .astype("int64"))
        return pa.table({
            "user_id": t["user_id"],
            "k": k.to_numpy(np.int64),
            "tu": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
        })

    evu = ev.map_batches(to_pairs, batch_format="pyarrow")
    lohi = evu.aggregate(Min("tu"), Max("tu"))
    lo, hi = int(lohi["min(tu)"]), int(lohi["max(tu)"])
    mid = lo + (hi - lo) // 2

    def half(keep_lt):
        def fn(t):
            m = pc.less(t["tu"], mid) if keep_lt else \
                pc.greater_equal(t["tu"], mid)
            return t.filter(m).select(["user_id", "k"])
        return evu.map_batches(fn, batch_format="pyarrow")

    return half(True), half(False)


def _q_media_resize(sf_dir):
    """Real thumbnail pipeline: documents → real mixed BMP/PNG payloads
    → actor-pool decode + nearest-neighbor resize to 8×8 → integer
    pixel checksum.  The floor-index resize contract makes the resized
    grid a closed form of strlen(text) — bit-exact SQL mirror."""
    from pgd_ray.stages.multimodal import media_from_documents, resize_images

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = media_from_documents(docs, payload_format="mixed")
    out = resize_images(media, out_w=8, out_h=8)
    return out.select_columns(["media_id", "width", "height", "pix_sum"])


def _q_percentile_cont_value(sf_dir):
    """ANSI PERCENTILE_CONT over events.value — interpolated exact
    quantiles from the histogram-refinement rank engine (no global
    sort; see stages/quantiles.py:percentile_cont)."""
    from pgd_ray.stages.quantiles import percentile_cont

    ev = _read(f"{sf_dir}/events.parquet", columns=["value"])
    return percentile_cont(ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def _q_dbscan_embeddings(sf_dir):
    """Exact DBSCAN over the embedding table (eps=1.15, min_pts=4) —
    stages.clustering.dbscan: broadcast-corpus exact baseline, round-9
    distance threshold contract, min-label cluster ids, border =
    min core-neighbor label, noise = -1."""
    from pgd_ray.stages.clustering import dbscan

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding"])
    return dbscan(ds, eps=1.15, min_pts=4)


def _q_mixture_weights(sf_dir):
    """Temperature-scaled (τ=0.7) training-mixture weights per source
    — text.sampling.mixture_weights (per-batch token partials, one
    #sources-row groupby, driver closed form)."""
    from pgd_ray.text.sampling import mixture_weights

    docs = _read(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return mixture_weights(docs, tau=0.7)


def _q_users_retained(sf_dir):
    """(user, props.k) combinations present in BOTH halves of the
    event-time range — SQL INTERSECT (distinct set semantics) as one
    tagged-union hash groupby (stages/setops.py)."""
    from pgd_ray.stages.setops import intersect_distinct

    first, second = _event_halves(sf_dir)
    return intersect_distinct(first, second, ["user_id", "k"])


def _q_users_churned(sf_dir):
    """(user, props.k) combinations seen only in the FIRST half — SQL
    EXCEPT via the same tagged-union shape."""
    from pgd_ray.stages.setops import except_distinct

    first, second = _event_halves(sf_dir)
    return except_distinct(first, second, ["user_id", "k"])


def _q_percolation(sf_dir):
    """Bond-percolation robustness profile of the co-purchase graph
    (content-hash edge subsampling at 4 keep-rates + distributed CC
    per level) — graph.percolation.percolation_profile."""
    from pgd_ray.graph.percolation import percolation_profile

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return percolation_profile(eds, vids,
                               levels=(0.2, 0.4, 0.6, 0.8), seed=42)


def _fiedler_chain() -> str:
    """The 64-round deflated-power-iteration Fiedler CTE chain (the
    fiedler_copurchase mirror), ending in relation ``fs(v, score)``
    (round-9) — shared by the fiedler query and the Cheeger sweep."""
    zq = """SELECT fd.it + 1 AS it, fd.v,
       (fd.y - AVG(fd.y) OVER ())
         / sqrt(SUM(fd.y * fd.y) OVER ()
                - (SELECT n FROM nn) * AVG(fd.y) OVER ()
                  * AVG(fd.y) OVER ()) AS z
FROM fd WHERE fd.it < 64"""
    return f"""{_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
cv AS (SELECT CAST(MAX(degree) + 1 AS DOUBLE) AS c FROM d),
fd(it, v, y) AS (
  SELECT 0, v, CAST(dv AS DOUBLE) FROM did
  UNION ALL
  SELECT z.it, z.v, ((SELECT c FROM cv) - d.degree) * z.z + nb.sz
  FROM ({zq}) z
  JOIN d ON d.v = z.v
  JOIN (SELECT s.src AS v, zi.it, SUM(zi.z) AS sz
        FROM s JOIN ({zq}) zi ON zi.v = s.dst
        GROUP BY 1, 2) nb
    ON nb.v = z.v AND nb.it = z.it),
fs AS (SELECT f.v,
       ROUND((f.y - AVG(f.y) OVER ())
             / sqrt(SUM(f.y * f.y) OVER ()
                    - (SELECT n FROM nn) * AVG(f.y) OVER ()
                      * AVG(f.y) OVER ()), 9) AS score
FROM (SELECT v, y FROM fd WHERE it = 64) f)"""


def _q_norm_quantiles(sf_dir):
    """Exact quantiles of the embedding L2 norms (the
    norm-collapse/outlier health check) — one streamed norm pass into
    the histogram-refinement rank engine (no sort)."""
    import pyarrow as pa

    from pgd_ray.stages.quantiles import exact_quantiles

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def norms(t: pa.Table) -> pa.Table:
        from pgd_ray.stages.similarity import _stack_embeddings

        m = _stack_embeddings(t["embedding"], np.float64)
        return pa.table({"norm": np.sqrt((m * m).sum(axis=1))})

    nds = emb.map_batches(norms, batch_format="pyarrow")
    out = exact_quantiles(nds, "norm", [0.01, 0.25, 0.5, 0.75, 0.99])
    out["value"] = np.round(out["value"].astype(float), 6)
    return out


def _q_type_daily_corr(sf_dir):
    """Pearson correlation matrix of event types' daily series —
    stages.windows.type_daily_corr (union-of-days alignment, missing
    = 0)."""
    from pgd_ray.stages.windows import type_daily_corr

    return type_daily_corr(sf_dir)


def _q_source_dup_rate(sf_dir):
    """Per-source exact-duplicate rate — text.dedup.source_dup_rate
    (128-bit content-hash distinct per source, two hash
    aggregations)."""
    from pgd_ray.text.dedup import source_dup_rate

    docs = _read(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_dup_rate(docs)


def _q_role_pair_latency(sf_dir):
    """Mean response gap per (previous role → responding role) pair —
    stages.conv_stats.role_pair_latency."""
    from pgd_ray.stages.conv_stats import role_pair_latency

    return role_pair_latency(_transcripts_ds(sf_dir))


def _q_anova_value_type(sf_dir):
    """One-way ANOVA F of value across event types —
    stages.regress.anova_value_by_type (one distributed moment
    pass)."""
    from pgd_ray.stages.regress import anova_value_by_type

    return anova_value_by_type(sf_dir)


def _q_conv_typicality(sf_dir):
    """Per-conversation mean NLL under the corpus tool-transition
    chain — stages.conv_stats.conv_typicality (the agent-anomaly
    screen; broadcast log-P table + conv-keyed sorted-block fold)."""
    from pgd_ray.stages.conv_stats import conv_typicality

    return conv_typicality(_transcripts_ds(sf_dir))


def _q_lateness_profile(sf_dir):
    """Watermark-planning lateness profile (arrival order = event_id)
    — stages.windows.lateness_profile (distributed prefix-max +
    log2-second bucket fold)."""
    from pgd_ray.stages.windows import lateness_profile

    return lateness_profile(sf_dir)


def _q_term_dispersion(sf_dir):
    """Church-Gale term burstiness (cf/df) for the top-50 vocabulary
    — text.analysis.term_dispersion (two-step-distinct df pass + the
    vocab cf shuffle)."""
    from pgd_ray.text.analysis import term_dispersion

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return term_dispersion(docs, n=50)


def _q_centrality_spearman(sf_dir):
    """Does PageRank just follow degree?  Spearman rank correlation
    between the round-9 PageRank scores and vertex degree, via the
    exact integer 2·avg-rank moments (the orbit_spearman contract).
    One row (n, rho)."""
    import math

    pr = _q_pagerank_copurchase(sf_dir)
    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    deg = pd.DataFrame({"v": vids, "y": csr.degrees().astype(np.int64)})
    o = pr.merge(deg, on="v")
    n = len(o)
    rx = (2 * o["score"].rank(method="average")).astype(np.int64) \
        .to_numpy(dtype=object)
    ry = (2 * o["y"].rank(method="average")).astype(np.int64) \
        .to_numpy(dtype=object)
    sx, sy = int(sum(rx)), int(sum(ry))
    sxx = int(sum(rx * rx))
    syy = int(sum(ry * ry))
    sxy = int(sum(rx * ry))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    num = n * sxy - sx * sy
    rho = (float(num) / math.sqrt(float(vx) * float(vy))
           if vx > 0 and vy > 0 else 0.0)
    return pd.DataFrame({"n": [np.int64(n)], "rho": [round(rho, 9)]})


def _q_rbo_rankings(sf_dir):
    """Rank-biased overlap (p=0.9, truncated) between the BM25 and
    cosine rankings (the RRF inputs) —
    stages.similarity.rbo_rankings."""
    import numpy as np

    from pgd_ray.stages.similarity import rbo_rankings, topk_cosine
    from pgd_ray.text.bm25 import bm25_rank

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bm = bm25_rank(docs, ["table", "sort", "hash"], k=20)
    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 1").to_pandas()
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    cos = topk_cosine(emb, q, k=20, dtype=np.float64)
    return rbo_rankings(bm["doc_id"].to_numpy(),
                        cos["vec_id"].to_numpy(), p=0.9)


def _q_coarsen_stats(sf_dir):
    """One multilevel-coarsening round: contract the deterministic
    maximal matching (heavy-edge contraction's structure step) and
    report the coarse graph — (n, n_super, m, m_coarse, node_ratio,
    edge_ratio).  The matching is the distributed stage; contraction
    is one vectorized relabel + distinct over the broadcast-class
    edge arrays."""
    from pgd_ray.graph.matching import maximal_matching

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    mate = maximal_matching(csr)
    n = csr.n
    v = np.arange(n, dtype=np.int64)
    sup = np.where(mate >= 0, np.minimum(v, mate), v)
    v_of = np.repeat(v, np.diff(csr.indptr))
    u_of = csr.indices.astype(np.int64)
    canon = v_of < u_of
    sa = sup[v_of[canon]]
    sb = sup[u_of[canon]]
    keep = sa != sb
    lo = np.minimum(sa[keep], sb[keep])
    hi = np.maximum(sa[keep], sb[keep])
    m_coarse = len(np.unique(lo * n + hi))
    m = int(canon.sum())
    n_super = len(np.unique(sup))
    return pd.DataFrame({
        "n": [np.int64(n)], "n_super": [np.int64(n_super)],
        "m": [np.int64(m)], "m_coarse": [np.int64(m_coarse)],
        "node_ratio": [round(n_super / n, 9)],
        "edge_ratio": [round(m_coarse / m, 9)],
    })


def _q_cheeger_cut(sf_dir):
    """Best spectral sweep cut (prefix-conductance minimum over the
    Fiedler order) — graph.community.cheeger_cut on the engine's
    fiedler_vector."""
    from pgd_ray.graph.community import cheeger_cut
    from pgd_ray.graph.iterative import fiedler_vector

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    x = fiedler_vector(csr, iters=64)
    return cheeger_cut(csr, x)


def _q_hour_heatmap(sf_dir):
    """Day-of-week × hour-of-day event heatmap (dow 0 = Monday, the
    dow_seasonality convention) — one hash aggregation, 168-row
    output."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    ev = _read(f"{sf_dir}/events.parquet", columns=["ts"])

    def keyed(t: pa.Table) -> pa.Table:
        tu = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = tu // 86_400_000_000
        hour = (tu % 86_400_000_000) // 3_600_000_000
        return pa.table({"dow": (day + 4) % 7, "hour": hour})

    out = (ev.map_batches(keyed, batch_format="pyarrow")
           .groupby(["dow", "hour"]).aggregate(Count(alias_name="n"))
           .to_pandas().sort_values(["dow", "hour"], ignore_index=True))
    out["dow"] = out["dow"].astype(np.int64)
    out["hour"] = out["hour"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def _q_negative_edges(sf_dir):
    """Deterministic negative-edge sample (500 from a 4000-counter
    splitmix proposal stream) — graph.linkpred.negative_edges
    (broadcast edge-key membership, counter-ordered head)."""
    from pgd_ray.graph.linkpred import negative_edges

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    acc = negative_edges(csr, k=500, budget=4000)
    return pd.DataFrame({"c": acc["c"].to_numpy(np.int64),
                         "src": vids[acc["lo"].to_numpy()],
                         "dst": vids[acc["hi"].to_numpy()]})


def _q_forman_curvature(sf_dir):
    """Augmented Forman-Ricci curvature per edge,
    F(e) = 4 − deg(u) − deg(v) + 3·tri(e) — the geometric
    bottleneck/community screen (negative = bridge-like, positive =
    clique-like).  One pass of the signature per-edge triangle kernel
    + a broadcast-degree decorate (the edge_clustering shape)."""
    import pyarrow as pa
    import ray as _ray

    from pgd_ray.graph.cache import get_cached
    from pgd_ray.graph.graphlets import edge_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    tri = edge_triangles(dense, csr.range_csr or csr)
    deg_ref = _ray.put(csr.degrees().astype(np.int64))

    def decorate(t: pa.Table) -> pa.Table:
        deg = get_cached(deg_ref)
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        tr = t["triangle"].to_numpy(zero_copy_only=False)
        f = 4 - deg[s] - deg[d] + 3 * tr
        return pa.table({"src": s, "dst": d,
                         "curvature": f.astype(np.int64)})

    out = tri.map_batches(decorate, batch_format="pyarrow").to_pandas()
    out["src"] = vids[out["src"].to_numpy()]
    out["dst"] = vids[out["dst"].to_numpy()]
    return out.sort_values(["src", "dst"], ignore_index=True)


def _q_latency_quantiles(sf_dir):
    """Per-role response-latency p50/p90/p99 (exact µs rank rule) —
    stages.conv_stats.latency_quantiles (gap rows as a Dataset →
    group-aware histogram-refinement quantiles)."""
    from pgd_ray.stages.conv_stats import latency_quantiles

    return latency_quantiles(_transcripts_ds(sf_dir), qs=(0.5, 0.9, 0.99))


def _q_skyline_parts(sf_dir):
    """Skyline (Pareto frontier) of parts on (min price, max size) —
    stages.skyline.skyline_parts (per-block frontier → same exact
    rule over the O(Σ local frontier) candidates)."""
    from pgd_ray.stages.skyline import skyline_parts

    return skyline_parts(sf_dir)


def _q_peak_concurrency(sf_dir):
    """Peak concurrent sessions + earliest peak time —
    stages.windows.peak_concurrency (distributed max-prefix sweep
    over session interval deltas)."""
    from pgd_ray.stages.windows import peak_concurrency

    return peak_concurrency(sf_dir)


def _q_vocab_coverage(sf_dir):
    """Top-k vocabulary occurrence coverage curve —
    text.analysis.vocab_coverage (one vocab shuffle + ordered head)."""
    from pgd_ray.text.analysis import vocab_coverage

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_coverage(docs, ks=(10, 100, 1000))


def _q_distinct_triples(sf_dir):
    """High-cardinality SELECT DISTINCT (user, type, day) through the
    sort-based distinct operator — stages.distinct.distinct_rows (the
    BASELINE.md hash-aggregate-vs-sort finding as a first-class op)."""
    import pyarrow as pa

    from pgd_ray.stages.distinct import distinct_rows

    ev = _read(f"{sf_dir}/events.parquet",
               columns=["user_id", "event_type", "ts"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"], "day": day})

    return distinct_rows(ev.map_batches(keyed, batch_format="pyarrow"),
                         ["user_id", "event_type", "day"])


def _q_containment_pairs(sf_dir):
    """Broder containment annotation on near-dup pairs (J ≥ 0.45
    recall contract) — text.dedup.containment_pairs (intersection
    recovered from the verified Jaccard + per-doc shingle counts)."""
    from pgd_ray.text.dedup import containment_pairs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return containment_pairs(docs, j_threshold=0.45)


def _q_revenue_pareto(sf_dir):
    """Top-decile revenue concentration — stages.rfm.revenue_pareto
    (per-customer hash agg, histogram-refinement k-th-largest, one
    tie-agnostic partial fold)."""
    from pgd_ray.stages.rfm import revenue_pareto

    return revenue_pareto(sf_dir, top_frac=0.1)


def _q_tool_colift(sf_dir):
    """Tool co-usage lift within conversations —
    stages.conv_stats.tool_colift (distinct (conv, tool) → per-conv
    bitmask → ≤2^T-row histogram fold)."""
    from pgd_ray.stages.conv_stats import tool_colift

    return tool_colift(_transcripts_ds(sf_dir))


def _q_local_bridges(sf_dir):
    """Granovetter local bridges: edges whose endpoints share NO
    common neighbor (triangle count 0 — the weak ties long-range
    information flows over).  One pass of the signature per-edge
    triangle kernel folded to a summary row (m, n_local_bridges,
    bridge_frac)."""
    from ray.data.aggregate import Count, Sum

    from pgd_ray.graph.graphlets import edge_triangles

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    tri = edge_triangles(dense, csr.range_csr or csr)

    def fold(t):
        tr = t["triangle"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({"m": [len(tr)],
                             "nb": [int((tr == 0).sum())]})

    agg = tri.map_batches(fold, batch_format="pyarrow").to_pandas()
    m = int(agg["m"].sum())
    nb = int(agg["nb"].sum())
    return pd.DataFrame({"m": [np.int64(m)],
                         "n_local_bridges": [np.int64(nb)],
                         "bridge_frac": [round(nb / m, 9) if m else 0.0]})


def _q_monthly_edge_overlap(sf_dir):
    """Month-over-month co-purchase edge persistence (consecutive
    observed months' Jaccard) — graph.temporal.monthly_edge_overlap
    (distinct (month, edge) groupby → one (edge, month) sort →
    adjacent-row counting with boundary-edge stitch)."""
    from pgd_ray.graph.temporal import monthly_edge_overlap

    return monthly_edge_overlap(sf_dir)


def _q_dedup_agreement(sf_dir):
    """Detector-agreement audit: docs flagged near-dup by the TEXT
    pipeline (MinHash-LSH + exact-Jaccard verify ≥ 0.7) vs by the
    EMBEDDING pipeline (cosine ≥ 0.45, doc_id == vec_id) — the
    overlap tells you whether the two dedup signals are redundant or
    complementary.  Both pair pipelines are the engine's distributed
    stages; the audit folds their flagged-id sets.  One row
    (n_text_dup, n_emb_dup, n_both, n_either, overlap_jaccard)."""
    import numpy as np

    from pgd_ray.text.dedup import candidate_pairs_minhash, embedding_neardup

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tp = candidate_pairs_minhash(docs, threshold=0.7)
    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    ep = embedding_neardup(emb, threshold=0.45, dtype=np.float64)
    tset = set(map(int, tp["doc_a"])) | set(map(int, tp["doc_b"]))
    eset = set(map(int, ep["vec_a"])) | set(map(int, ep["vec_b"]))
    both = len(tset & eset)
    either = len(tset | eset)
    return pd.DataFrame({
        "n_text_dup": [np.int64(len(tset))],
        "n_emb_dup": [np.int64(len(eset))],
        "n_both": [np.int64(both)],
        "n_either": [np.int64(either)],
        "overlap_jaccard": [round(both / either, 9) if either else 0.0],
    })


def _q_lexicon_screen(sf_dir):
    """Blocklist lexicon screen (marketing-word default list) —
    text.analysis.lexicon_screen (one stateless pass, C string
    kernels)."""
    from pgd_ray.text.analysis import lexicon_screen

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lexicon_screen(docs)


def _q_w1_value(sf_dir):
    """Exact 1-Wasserstein drift between the event-time halves of
    events.value — stages.drift.w1_value (the ks_value prefix-sum
    plan + an O(#blocks) next-value stitch)."""
    from pgd_ray.stages.drift import w1_value

    return w1_value(sf_dir)


def _q_transition_entropy(sf_dir):
    """Per-tool next-tool entropy + the chain's empirical entropy
    rate — stages.conv_stats.transition_entropy."""
    from pgd_ray.stages.conv_stats import transition_entropy

    return transition_entropy(_transcripts_ds(sf_dir))


def _q_hapax_stats(sf_dir):
    """Hapax-legomena lexical-richness profile —
    text.analysis.hapax_stats (one vocab shuffle + a frequency
    histogram fold; driver sees O(#distinct counts) rows)."""
    from pgd_ray.text.analysis import hapax_stats

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return hapax_stats(docs)


def _q_user_burstiness(sf_dir):
    """Per-user burstiness B = (σ−μ)/(σ+μ) of inter-event gaps —
    stages.windows.user_burstiness (sorted-block per-user moment
    partials + boundary stitch)."""
    from pgd_ray.stages.windows import user_burstiness

    return user_burstiness(sf_dir)


def _q_tool_pagerank(sf_dir):
    """Directed PageRank on the tool-transition digraph (dangling =
    self-loop, 32 fixed rounds) — stages.conv_stats.tool_pagerank."""
    from pgd_ray.stages.conv_stats import tool_pagerank

    return tool_pagerank(_transcripts_ds(sf_dir), alpha=0.85, iters=32)


def _q_lang_confusion(sf_dir):
    """Declared-vs-detected language confusion matrix —
    text.analysis.lang_confusion (LangId pass + one hash join +
    O(#langs²) aggregation)."""
    from pgd_ray.text.analysis import lang_confusion

    docs = _read(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text", "lang"])
    return lang_confusion(docs)


def _percolation_sql(levels=(0.2, 0.4, 0.6, 0.8), seed: int = 42) -> str:
    """Per-level content-hash edge subsample (bit-exact _edgemix_sql
    mirror) + recursive min-label CC + giant-component fold."""
    parts, selects = [], []
    for i, p in enumerate(levels):
        thresh = int(p * 2.0 ** 64)
        parts.append(f"""k{i} AS (SELECT src, dst FROM e
  WHERE {_edgemix_sql(seed)} < CAST('{thresh}' AS HUGEINT))""")
        parts.append(f"""s{i} AS (SELECT src, dst FROM k{i}
  UNION ALL SELECT dst, src FROM k{i})""")
        parts.append(f"v{i} AS (SELECT DISTINCT src AS v FROM s{i})")
        parts.append(f"""w{i}(v, comp) AS (
  SELECT v, v FROM v{i}
  UNION
  SELECT s{i}.dst, w{i}.comp FROM w{i} JOIN s{i} ON s{i}.src = w{i}.v)""")
        parts.append(
            f"c{i} AS (SELECT v, MIN(comp) AS comp FROM w{i} GROUP BY v)")
        parts.append(
            f"g{i} AS (SELECT comp, COUNT(*) AS sz FROM c{i} GROUP BY comp)")
        selects.append(f"""SELECT CAST({p} AS DOUBLE) AS p,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM k{i}) AS m_kept,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM v{i}) AS n_active,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM g{i}) AS n_components,
  ROUND((SELECT CAST(MAX(sz) AS DOUBLE) FROM g{i})
        / (SELECT COUNT(*) FROM v{i}), 9) AS giant_frac""")
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _q_attack(sf_dir):
    """Targeted hub-removal robustness profile —
    graph.percolation.attack_profile (top-degree removal sets,
    broadcast-membership edge filter, distributed CC per level)."""
    from pgd_ray.graph.percolation import attack_profile

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    return attack_profile(eds, vids, csr.degrees(),
                          fracs=(0.01, 0.05, 0.1, 0.2))


def _attack_sql(fracs=(0.01, 0.05, 0.1, 0.2)) -> str:
    """Per-level top-degree removal + recursive min-label CC."""
    parts, selects = [], []
    for i, f in enumerate(fracs):
        parts.append(f"""rm{i} AS (SELECT v FROM (
  SELECT v, row_number() OVER (ORDER BY degree DESC, v) AS rn FROM d)
  WHERE rn <= CAST(CEIL({f} * (SELECT COUNT(*) FROM d)) AS BIGINT))""")
        parts.append(f"""ke{i} AS (SELECT src, dst FROM e
  WHERE src NOT IN (SELECT v FROM rm{i})
    AND dst NOT IN (SELECT v FROM rm{i}))""")
        parts.append(f"""sy{i} AS (SELECT src, dst FROM ke{i}
  UNION ALL SELECT dst, src FROM ke{i})""")
        parts.append(f"va{i} AS (SELECT DISTINCT src AS v FROM sy{i})")
        parts.append(f"""wa{i}(v, comp) AS (
  SELECT v, v FROM va{i}
  UNION
  SELECT sy{i}.dst, wa{i}.comp FROM wa{i}
  JOIN sy{i} ON sy{i}.src = wa{i}.v)""")
        parts.append(
            f"ca{i} AS (SELECT v, MIN(comp) AS comp FROM wa{i} GROUP BY v)")
        parts.append(
            f"ga{i} AS (SELECT comp, COUNT(*) AS sz FROM ca{i} GROUP BY comp)")
        selects.append(f"""SELECT CAST({f} AS DOUBLE) AS frac,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM rm{i}) AS n_removed,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ke{i}) AS m_kept,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM va{i}) AS n_active,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ga{i}) AS n_components,
  ROUND((SELECT CAST(MAX(sz) AS DOUBLE) FROM ga{i})
        / (SELECT COUNT(*) FROM va{i}), 9) AS giant_frac""")
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _q_type_user_jaccard(sf_dir):
    """Audience-overlap Jaccard between event types' distinct-user
    sets — stages.basket.type_user_jaccard (two hash aggregations +
    a ≤2^T-row mask histogram)."""
    from pgd_ray.stages.basket import type_user_jaccard

    return type_user_jaccard(sf_dir)


def _q_cluster_validity(sf_dir):
    """Calinski-Harabasz + Davies-Bouldin validity of the embedding
    table's given labels — stages.clustering.cluster_validity (two
    streamed passes, k·d-row shuffles)."""
    from pgd_ray.stages.clustering import cluster_validity

    ds = _read(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding", "label"])
    return cluster_validity(ds)


def _q_sssp_copurchase(sf_dir):
    """Weighted single-source shortest paths (Bellman-Ford, 30 fixed
    rounds) over basket-count edge weights from the min part —
    graph.iterative.sssp_distances (per-edge-slot weights on the
    actor executor; integer-exact)."""
    from pgd_ray.graph.iterative import (SSSP_INF, slot_weights,
                                         sssp_distances)
    from pgd_ray.stages.basket import pair_counts

    eds, dense, csr, vids = _copurchase_bundle(sf_dir)
    pc_df = pair_counts(sf_dir).to_pandas()
    a = np.searchsorted(vids, pc_df["part_a"].to_numpy())
    b = np.searchsorted(vids, pc_df["part_b"].to_numpy())
    w = slot_weights(csr, a, b, pc_df["n_both"].to_numpy())
    dist = sssp_distances(csr, w, source=0, rounds=30)
    return pd.DataFrame({"v": vids,
                         "dist": np.where(dist >= SSSP_INF, -1,
                                          dist).astype(np.int64)})


def _q_simrank_tool(sf_dir):
    """SimRank similarity over the tool co-occurrence graph (C=0.8,
    5 rounds) — graph.linkpred.simrank (vocabulary-sized pair state;
    the distributed stage is the transcript→edge derivation)."""
    from pgd_ray.graph.linkpred import simrank

    eds, csr, vocab = _tool_graph(sf_dir)
    S = simrank(csr, C=0.8, iters=5)
    iu, ju = np.triu_indices(csr.n, 1)
    return pd.DataFrame({"tool_a": np.asarray(vocab, dtype=object)[iu],
                         "tool_b": np.asarray(vocab, dtype=object)[ju],
                         "simrank": np.round(S[iu, ju], 9)})


def _simrank_sql(iters: int = 5) -> str:
    parts = [
        """sym AS (SELECT src AS u, dst AS v FROM e
       UNION ALL SELECT dst, src FROM e)""",
        """dg AS (SELECT vocab.tid AS v, CAST(COALESCE(c.d, 0) AS BIGINT) AS deg
       FROM vocab LEFT JOIN (SELECT u, COUNT(*) AS d FROM sym GROUP BY u) c
       ON c.u = vocab.tid)""",
        "p AS (SELECT a.tid AS a, b.tid AS b FROM vocab a CROSS JOIN vocab b)",
        """s0 AS (SELECT a, b, CASE WHEN a = b THEN CAST(1.0 AS DOUBLE)
                          ELSE 0.0 END AS s FROM p)""",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""s{i} AS (
  SELECT p.a, p.b,
         CASE WHEN p.a = p.b THEN CAST(1.0 AS DOUBLE)
              WHEN da.deg = 0 OR db.deg = 0 THEN 0.0
              ELSE CAST(0.8 AS DOUBLE) / (da.deg * db.deg) *
                   COALESCE((SELECT SUM(pr.s)
                             FROM sym na, sym nb, s{i - 1} pr
                             WHERE na.u = p.a AND nb.u = p.b
                               AND pr.a = na.v AND pr.b = nb.v), 0.0)
         END AS s
  FROM p JOIN dg da ON da.v = p.a JOIN dg db ON db.v = p.b)""")
    return (",\n".join(parts)
            + f""",
fin AS (SELECT va.tool AS tool_a, vb.tool AS tool_b, ROUND(x.s, 9) AS simrank
        FROM s{iters} x JOIN vocab va ON va.tid = x.a
        JOIN vocab vb ON vb.tid = x.b
        WHERE x.a < x.b)""")


def _q_users_any_half(sf_dir):
    """(user, props.k) combinations present in EITHER event-time half
    — SQL UNION (distinct set semantics), completing the set-op family
    (stages/setops.py, same tagged-union shape)."""
    from pgd_ray.stages.setops import union_distinct

    first, second = _event_halves(sf_dir)
    return union_distinct(first, second, ["user_id", "k"])


def _q_window_functions2(sf_dir):
    """Second-wave per-user window functions (percent_rank +
    full-frame first/last value) — stages.windows.window_functions2
    (composes the sorted-block row_number machinery with one hash
    aggregation and O(#keys) broadcast lookups)."""
    from pgd_ray.stages.windows import window_functions2
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])
    return window_functions2(ev, key="user_id", order="event_id",
                             value="value")


def _q_cube_events(sf_dir):
    """GROUP BY CUBE over (event_type, day-of-week) — all four grains
    from one finest-grain distributed aggregation
    (stages.cube.cube_counts; rollup sentinels)."""
    from pgd_ray.stages.cube import cube_counts

    return cube_counts(sf_dir, exact_cents=True)


def _q_ccf_daily(sf_dir):
    """Lead-lag cross-correlation of the view/purchase daily series
    at lags ±7 — stages.windows.ccf_daily (one (day, side)
    aggregation, O(days) driver math)."""
    from pgd_ray.stages.windows import ccf_daily

    return ccf_daily(sf_dir, type_x="view", type_y="purchase", max_lag=7)


def _q_kaplan_meier(sf_dir):
    """Kaplan–Meier user-lifetime survival curve (7-day churn rule,
    right-censoring at corpus end) — stages.retention.kaplan_meier
    (two hash aggregations; O(#distinct durations) driver recursion)."""
    from pgd_ray.stages.retention import kaplan_meier

    return kaplan_meier(sf_dir, churn_days=7)


def _q_tool_scc(sf_dir):
    """Strongly connected components of the tool-transition digraph —
    stages.conv_stats.tool_scc (shared transition plan + boolean
    closure on the O(#tools²) vocabulary digraph)."""
    from pgd_ray.stages.conv_stats import tool_scc

    return tool_scc(_transcripts_ds(sf_dir))


def _q_pq_codes(sf_dir):
    """Product-quantization codes + reconstruction error (m=4
    subspaces × k=16 round-6 Lloyd codebooks) —
    stages.quantization.pq_codes (m×iters streamed Lloyd passes, one
    broadcast-codebook encode pass, Dataset out)."""
    from pgd_ray.stages.quantization import pq_codes

    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    codes, _ = pq_codes(emb, m=4, k=16, iters=3)
    return codes


def _pq_sql(m: int = 4, k: int = 16, iters: int = 3) -> str:
    """Mirror of stages.quantization.pq_codes: one _kmeans_sql-style
    round-6 Lloyd chain PER SUBSPACE over the 1-based inclusive list
    slice, final assignment carrying the squared distance, codes
    joined on vec_id, sqerr = left-associated subspace sum."""
    parts = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
             "dd AS (SELECT len(v) AS d FROM e LIMIT 1)"]
    assign = """{name} AS (SELECT vec_id, v, cid FROM (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_distance(e.v, c.v), c.cid) AS rk
  FROM {src} e CROSS JOIN {cent} c) WHERE rk = 1)"""
    for j in range(m):
        p = f"s{j}"
        parts.append(
            f"""{p}e AS (SELECT vec_id,
       v[CAST({j} * (SELECT d FROM dd) / {m} + 1 AS BIGINT)
         : CAST({j + 1} * (SELECT d FROM dd) / {m} AS BIGINT)] AS v
       FROM e)""")
        parts.append(
            f"""{p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
       FROM (SELECT vec_id, v FROM {p}e ORDER BY vec_id LIMIT {k}))""")
        for i in range(1, iters + 1):
            parts.append(assign.format(name=f"{p}a{i}", src=f"{p}e",
                                       cent=f"{p}c{i - 1}"))
            parts.append(
                f"""{p}m{i} AS (SELECT cid, dim, ROUND(SUM(x)/COUNT(*), 6) AS cx FROM (
  SELECT cid, CAST(unnest(v) AS DOUBLE) AS x,
         unnest(generate_series(1, len(v))) AS dim FROM {p}a{i}) GROUP BY cid, dim)""")
            parts.append(
                f"""{p}c{i} AS (SELECT p.cid, COALESCE(l.v, p.v) AS v FROM {p}c{i - 1} p
  LEFT JOIN (SELECT cid, list(cx ORDER BY dim) AS v FROM {p}m{i} GROUP BY cid) l
  ON l.cid = p.cid)""")
        parts.append(
            f"""{p}af AS (SELECT vec_id, cid, d2 FROM (
  SELECT e.vec_id, c.cid,
         list_sum(list_transform(generate_series(1, len(e.v)),
                  i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_distance(e.v, c.v), c.cid) AS rk
  FROM {p}e e CROSS JOIN {p}c{iters} c) WHERE rk = 1)""")
    code_cols = ", ".join(
        f"CAST(s{j}af.cid AS BIGINT) AS code_{j}" for j in range(m))
    err = " + ".join(f"s{j}af.d2" for j in range(m))
    joins = " ".join(
        f"JOIN s{j}af ON s{j}af.vec_id = s0af.vec_id" for j in range(1, m))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT s0af.vec_id, {code_cols}, ROUND({err}, 6) AS sqerr"
            + f"\nFROM s0af {joins}")


def _q_rrf_fusion(sf_dir):
    """Hybrid-retrieval reciprocal-rank fusion: BM25 top-20 for the
    fixed query ⊕ cosine top-20 for probe vec 0, joined on
    doc_id == vec_id — stages.similarity.rrf_fusion (the two rankers
    are the distributed stages; fusion is two k-row lists)."""
    import numpy as np

    from pgd_ray.stages.similarity import rrf_fusion, topk_cosine
    from pgd_ray.text.bm25 import bm25_rank

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bm = bm25_rank(docs, ["table", "sort", "hash"], k=20)
    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 1").to_pandas()
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    cos = topk_cosine(emb, q, k=20, dtype=np.float64)
    return rrf_fusion(bm, cos, k0=60, out_k=10)


def _q_entity_groups(sf_dir):
    """Entity-resolution clusters: CC over the verified fuzzy-match
    pair graph, canonical = min name per component —
    stages.fuzzy.entity_groups (participants-only CC, broadcast
    assignment, Dataset out)."""
    from pgd_ray.stages.fuzzy import entity_groups

    return entity_groups(sf_dir, max_dist=2)


def _q_holt_daily(sf_dir):
    """Holt level+trend smoothing of total daily event counts —
    stages.windows.holt_daily (one distributed day aggregation,
    O(days) driver recurrence, pinned float op order)."""
    from pgd_ray.stages.windows import holt_daily

    return holt_daily(sf_dir, alpha=0.5, beta=0.3)


def _q_role_assortativity(sf_dir):
    """Newman categorical assortativity of role labels across
    consecutive-turn transitions — stages.conv_stats.role_assortativity
    (shared sorted-block transition plan; O(#roles²) driver rows)."""
    from pgd_ray.stages.conv_stats import role_assortativity

    return role_assortativity(_transcripts_ds(sf_dir))


def _q_transition_reciprocity(sf_dir):
    """Reciprocity of the tool-transition digraph (weighted min-mass
    and unordered-pair forms) —
    stages.conv_stats.transition_reciprocity."""
    from pgd_ray.stages.conv_stats import transition_reciprocity

    return transition_reciprocity(_transcripts_ds(sf_dir))


def _q_psi_value(sf_dir):
    """Population Stability Index of events.value between the two
    event-time halves (10 fixed global-range bins) —
    stages.drift.psi_value (one aggregate pass + one streamed
    2·nbins-partials pass; O(nbins·#blocks) driver combine)."""
    from pgd_ray.stages.drift import psi_value

    return psi_value(sf_dir, nbins=10)


def _q_ks_value(sf_dir):
    """Exact two-sample Kolmogorov–Smirnov D between the event-time
    halves of events.value — stages.drift.ks_value (groupby(value) →
    one sort → distributed prefix-sum; driver sees #blocks rows)."""
    from pgd_ray.stages.drift import ks_value

    return ks_value(sf_dir)


def entry() -> Any:
    """Flagship pipeline on sf0.001 (see pgd_ray.pipelines.flagship)."""
    from pgd_ray.pipelines.flagship import flagship

    summary, mac = flagship(SF_SMOKE, n_workers=4)
    return summary


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts": _q_transcripts,
        "transcript_edges": _q_transcript_edges,
        "edges_copurchase": _q_edges_copurchase,
        "degree_table": _q_degree_table,
        "graph_stats": _q_graph_stats,
        "assortativity": _q_assortativity,
        "triangle_count": _q_triangle_count,
        "edge_triangles": _q_edge_triangles,
        "edge_clustering": _q_edge_clustering,
        "wedges_cc": _q_wedges_cc,
        "macro_tool_graph": _q_macro_tool_graph,
        "cc_copurchase": _q_cc_copurchase,
        "pagerank_copurchase": _q_pagerank_copurchase,
        "kcore_copurchase": _q_kcore_copurchase,
        "eigencen_copurchase": _q_eigencen_copurchase,
        "katz_copurchase": _q_katz_copurchase,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "inter_event_gaps": _q_inter_event_gaps,
        "basket_lift": _q_basket_lift,
        "silhouette_kmeans": _q_silhouette,
        "weighted_pagerank": _q_weighted_pagerank,
        "conductance_tool": _q_conductance_tool,
        "conductance_cores": _q_conductance_cores,
        "embedding_covariance": _q_embedding_covariance,
        "pca_embeddings": _q_pca_embeddings,
        "knn_clusters": _q_knn_clusters,
        "jl_ratios": _q_jl_ratios,
        "intrinsic_dim": _q_intrinsic_dim,
        "source_overlap": _q_source_overlap,
        "readability": _q_readability,
        "centroid_confusion": _q_centroid_confusion,
        "bloom_semi_orders": _q_bloom_semi_orders,
        "event_islands": _q_event_islands,
        "clustering_spectrum": _q_clustering_spectrum,
        "json_props": _q_json_props,
        "user_entropy": _q_user_entropy,
        "char_entropy": _q_char_entropy,
        "markov_stationary": _q_markov_stationary,
        "unigram_xent": _q_unigram_xent,
        "chi2_type_dow": _q_chi2_type_dow,
        "benford_prices": _q_benford_prices,
        "ewma_daily": _q_ewma_daily,
        "acf_daily": _q_acf_daily,
        "cusum_daily": _q_cusum_daily,
        "trending_daily": _q_trending_daily,
        "dow_seasonality": _q_dow_seasonality,
        "type_runs": _q_type_runs,
        "grouped_ols": _q_grouped_ols,
        "fuzzy_names": _q_fuzzy_names,
        "value_quartiles": _q_value_quartiles,
        "window_distinct_users": _q_window_distinct_users,
        "diameter_lb": _q_diameter_lb,
        "comp_size_hist": _q_comp_size_hist,
        "pmi_collocations": _q_pmi_collocations,
        "decayed_counts": _q_decayed_counts,
        "rollup_events": _q_rollup_events,
        "pivot_user_types": _q_pivot_user_types,
        "bpe_pairs": _q_bpe_pairs,
        "hits_authorities": _q_hits_authorities,
        "hits_hubs": _q_hits_hubs,
        "butterflies_type": _q_butterflies,
        "mis_copurchase": _q_mis_copurchase,
        "matching_copurchase": _q_matching_copurchase,
        "msf_copurchase": _q_msf_copurchase,
        "fiedler_copurchase": _q_fiedler_copurchase,
        "monthly_graph": _q_monthly_graph,
        "coloring_copurchase": _q_coloring_copurchase,
        "anf_copurchase": _q_anf_copurchase,
        "neighborhood_function": _q_neighborhood_function,
        "bfs_copurchase": _q_bfs_copurchase,
        "harmonic_copurchase": _q_harmonic_copurchase,
        "betweenness_copurchase": _q_betweenness_copurchase,
        "closeness_copurchase": _q_closeness_copurchase,
        "random_walks_copurchase": _q_random_walks_copurchase,
        "ego_copurchase": _q_ego_copurchase,
        "ktruss_copurchase": _q_ktruss_copurchase,
        "densest_copurchase": _q_densest_copurchase,
        "onion_copurchase": _q_onion_copurchase,
        "two_hop_sizes": _q_two_hop_sizes,
        "rich_club": _q_rich_club,
        "wl_colors": _q_wl_colors,
        "s_metric": _q_s_metric,
        "link_pred_copurchase": _q_link_pred_copurchase,
        "link_pred_scores_copurchase": _q_link_pred_scores_copurchase,
        "ppr_copurchase": _q_ppr_copurchase,
        "label_prop_tool": _q_label_prop_tool,
        "modularity_tool": _q_modularity_tool,
        "text_stats": _q_text_stats,
        "fingerprints": _q_fingerprints,
        "exact_dedup": _q_exact_dedup,
        "segment_dedup": _q_segment_dedup,
        "lang_id": _q_lang_id,
        "minhash_dedup": _q_minhash_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash_pairs": _q_simhash_pairs,
        "clean_corpus": _q_clean_corpus,
        "topk_cosine": _q_topk_cosine,
        "mmr_rerank": _q_mmr_rerank,
        "quantization_error": _q_quantization_error,
        "ivf_topk": _q_ivf_topk,
        "embedding_neardup": _q_embedding_neardup,
        "kmeans_embeddings": _q_kmeans_embeddings,
        "semdedup": _q_semdedup,
        "univar_clique4": _q_univar_clique4,
        "media_decode": _q_media_decode,
        "vertex_triangles": _q_vertex_triangles,
        "tumbling_counts": _q_tumbling_counts,
        "funnel_events": _q_funnel_events,
        "sessions": _q_sessions,
        "window_functions": _q_window_functions,
        "rolling_windows": _q_rolling_windows,
        "retention": _q_retention,
        "event_type_stats": _q_event_type_stats,
        "cms_user_counts": _q_cms_user_counts,
        "pii_scan": _q_pii_scan,
        "normalize_text": _q_normalize_text,
        "value_histogram": _q_value_histogram,
        "returnflag_corr": _q_returnflag_corr,
        "chunk_docs": _q_chunk_docs,
        "tpch_q4": _q_tpch_q4,
        "tpch_q7": _q_tpch_q7,
        "tpch_q10": _q_tpch_q10,
        "tpch_q13": _q_tpch_q13,
        "tpch_q12": _q_tpch_q12,
        "tpch_q14": _q_tpch_q14,
        "tpch_q18": _q_tpch_q18,
        "cust_no_orders": _q_cust_no_orders,
        "asof_orders": _q_asof_orders,
        "range_join_ship": _q_range_join_ship,
        "macro_approx_tool_graph": _q_macro_approx_tool_graph,
        "hopping_counts": _q_hopping_counts,
        "heavy_hitters": _q_heavy_hitters,
        "sample_docs": _q_sample_docs,
        "vocab_topk": _q_vocab_topk,
        "quantiles_value": _q_quantiles_value,
        "distinct_users": _q_distinct_users,
        "hll_users": _q_hll_users,
        "kmv_events": _q_kmv_events,
        "zipf_slope": _q_zipf_slope,
        "stratified_docs": _q_stratified_docs,
        "cap_per_source": _q_cap_per_source,
        "pack_assignments": _q_pack_assignments,
        "repetition_stats": _q_repetition_stats,
        "bigram_lm": _q_bigram_lm,
        "decontaminate": _q_decontaminate,
        "curate_corpus": _q_curate_corpus,
        "tfidf_top5": _q_tfidf_top5,
        "bm25_rank": _q_bm25_rank,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "local_cc": _q_local_cc,
        "cooccurrence": _q_cooccurrence,
        "transitions": _q_transitions,
        "trigrams": _q_trigrams,
        "degree_histogram": _q_degree_histogram,
        "hill_alpha": _q_hill_alpha,
        "grouped_quantiles": _q_grouped_quantiles,
        "mad_outliers": _q_mad_outliers,
        "weighted_sample": _q_weighted_sample,
        "lexical_diversity": _q_lexical_diversity,
        "user_activity": _q_user_activity,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q6": _q_tpch_q6,
        "tpch_q8": _q_tpch_q8,
        "tpch_q15": _q_tpch_q15,
        "tpch_q17": _q_tpch_q17,
        "tpch_q19": _q_tpch_q19,
        "tpch_q21": _q_tpch_q21,
        "tpch_q22": _q_tpch_q22,
        "tpch_q2": _q_tpch_q2,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q20": _q_tpch_q20,
        "textrank_keywords": _q_textrank,
        "rake_keyphrases": _q_rake,
        "degree_gini": _q_degree_gini,
        "hopkins": _q_hopkins,
        "hard_negatives": _q_hard_negatives,
        "rfm_segments": _q_rfm,
        "boilerplate_lines": _q_boilerplate,
        "motif_significance": _q_motif_significance,
        "conv_profile": _q_conv_profile,
        "response_latency": _q_response_latency,
        "tool_transitions": _q_tool_transitions,
        "conv_docs": _q_conv_docs,
        "profile_events": _q_profile_events,
        "table_diff_events": _q_table_diff_events,
        "key_skew": _q_key_skew,
        "vertex_orbits3": _q_vertex_orbits3,
        "orbit_spearman": _q_orbit_spearman,
        "vertex_orbits4_tool": _q_vertex_orbits4_tool,
        "users_retained": _q_users_retained,
        "users_churned": _q_users_churned,
        "media_resize": _q_media_resize,
        "percentile_cont_value": _q_percentile_cont_value,
        "dbscan_embeddings": _q_dbscan_embeddings,
        "mixture_weights": _q_mixture_weights,
        "psi_value": _q_psi_value,
        "ks_value": _q_ks_value,
        "role_assortativity": _q_role_assortativity,
        "transition_reciprocity": _q_transition_reciprocity,
        "holt_daily": _q_holt_daily,
        "entity_groups": _q_entity_groups,
        "rrf_fusion": _q_rrf_fusion,
        "pq_codes": _q_pq_codes,
        "tool_scc": _q_tool_scc,
        "kaplan_meier": _q_kaplan_meier,
        "ccf_daily": _q_ccf_daily,
        "cube_events": _q_cube_events,
        "window_functions2": _q_window_functions2,
        "users_any_half": _q_users_any_half,
        "simrank_tool": _q_simrank_tool,
        "sssp_copurchase": _q_sssp_copurchase,
        "cluster_validity": _q_cluster_validity,
        "type_user_jaccard": _q_type_user_jaccard,
        "percolation": _q_percolation,
        "lang_confusion": _q_lang_confusion,
        "tool_pagerank": _q_tool_pagerank,
        "user_burstiness": _q_user_burstiness,
        "hapax_stats": _q_hapax_stats,
        "attack": _q_attack,
        "transition_entropy": _q_transition_entropy,
        "w1_value": _q_w1_value,
        "lexicon_screen": _q_lexicon_screen,
        "dedup_agreement": _q_dedup_agreement,
        "monthly_edge_overlap": _q_monthly_edge_overlap,
        "local_bridges": _q_local_bridges,
        "tool_colift": _q_tool_colift,
        "revenue_pareto": _q_revenue_pareto,
        "containment_pairs": _q_containment_pairs,
        "distinct_triples": _q_distinct_triples,
        "vocab_coverage": _q_vocab_coverage,
        "peak_concurrency": _q_peak_concurrency,
        "skyline_parts": _q_skyline_parts,
        "latency_quantiles": _q_latency_quantiles,
        "forman_curvature": _q_forman_curvature,
        "negative_edges": _q_negative_edges,
        "hour_heatmap": _q_hour_heatmap,
        "cheeger_cut": _q_cheeger_cut,
        "coarsen_stats": _q_coarsen_stats,
        "rbo_rankings": _q_rbo_rankings,
        "centrality_spearman": _q_centrality_spearman,
        "term_dispersion": _q_term_dispersion,
        "lateness_profile": _q_lateness_profile,
        "conv_typicality": _q_conv_typicality,
        "anova_value_type": _q_anova_value_type,
        "role_pair_latency": _q_role_pair_latency,
        "source_dup_rate": _q_source_dup_rate,
        "type_daily_corr": _q_type_daily_corr,
        "norm_quantiles": _q_norm_quantiles,
    }


def _orbit_spearman_sql() -> str:
    """Spearman GCM over the k=3 orbits — integer 2·avg-rank
    (2·cnt_less + cnt_eq + 1) per column, HUGEINT moments, the exact
    division mirrored from graph.graphlets.orbit_spearman."""
    cols = ["orbit0_degree", "orbit1_path_end",
            "orbit2_wedge_center", "orbit3_triangle"]
    rank_ctes, joins = [], []
    for i in range(4):
        rank_ctes.append(f"""
h{i} AS (SELECT o{i} AS val, CAST(COUNT(*) AS BIGINT) AS c
         FROM o GROUP BY 1),
w{i} AS (SELECT val,
                CAST(2 * COALESCE(SUM(c) OVER (ORDER BY val
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) + c + 1 AS BIGINT) AS r2
         FROM h{i})""")
        joins.append(f"JOIN w{i} ON w{i}.val = o.o{i}")
    sums = ",\n             ".join(
        [f"CAST(SUM(w{i}.r2) AS HUGEINT) AS s{i}" for i in range(4)]
        + [f"CAST(SUM(w{i}.r2 * w{i}.r2) AS HUGEINT) AS s{i}{i}"
           for i in range(4)]
        + [f"CAST(SUM(w{i}.r2 * w{j}.r2) AS HUGEINT) AS s{i}{j}"
           for i in range(4) for j in range(i + 1, 4)])
    pair_sel = "\nUNION ALL\n".join(f"""
SELECT '{cols[i]}' AS orbit_a, '{cols[j]}' AS orbit_b,
       ROUND(CASE WHEN (n*s{i}{i} - s{i}*s{i}) > 0
                   AND (n*s{j}{j} - s{j}*s{j}) > 0
                  THEN CAST(n*s{i}{j} - s{i}*s{j} AS DOUBLE)
                       / sqrt(CAST(n*s{i}{i} - s{i}*s{i} AS DOUBLE)
                              * CAST(n*s{j}{j} - s{j}*s{j} AS DOUBLE))
                  ELSE 0.0 END, 9) AS rho
FROM m""" for i in range(4) for j in range(i + 1, 4))
    return f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
et AS (SELECT e.src, e.dst, COUNT(s2.dst) AS triangle
       FROM e LEFT JOIN s s1 ON s1.src = e.src
              LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
       GROUP BY e.src, e.dst),
up AS (SELECT src AS v, triangle FROM et
       UNION ALL SELECT dst AS v, triangle FROM et),
vt AS (SELECT v, CAST(SUM(triangle) // 2 AS BIGINT) AS tri
       FROM up GROUP BY v),
sn AS (SELECT s.src AS v, CAST(SUM(d2.degree) AS BIGINT) AS snbr
       FROM s JOIN d d2 ON d2.v = s.dst GROUP BY 1),
o AS (SELECT d.v,
             CAST(d.degree AS BIGINT) AS o0,
             CAST(sn.snbr - d.degree - 2 * vt.tri AS BIGINT) AS o1,
             CAST(d.degree * (d.degree - 1) // 2 - vt.tri AS BIGINT)
               AS o2,
             vt.tri AS o3
      FROM d JOIN vt ON vt.v = d.v JOIN sn ON sn.v = d.v),
{",".join(rank_ctes)},
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             {sums}
      FROM o {" ".join(joins)})
{pair_sel}"""


def _betweenness_sql(max_level: int = 16) -> str:
    """Sampled Brandes betweenness mirror: seeded BFS distances
    (recursive walk), shortest-path counts (recursive per-level sigma
    sums, HUGEINT-exact), then the backward dependency sweep UNROLLED
    over levels max_level..0 — level l's x-values need only level
    l+1's (BFS DAG property), so the chain is static.  x-form matches
    the engine: x = (1 + sg*succ_sum)/sg, delta = sg*x - 1.
    ``max_level`` bounds the graph diameter at the tested scales (the
    engine itself is uncapped).  Every chained CTE is MATERIALIZED:
    each x_l is referenced twice (by x_{{l-1}} and by the final union),
    so inlining would re-expand the chain exponentially."""
    xs = [f"""x{max_level} AS MATERIALIZED (
  SELECT m.sv, m.v, (1 + f.sg * 0) / f.sg AS xv
  FROM md m JOIN sgf f ON f.sv = m.sv AND f.v = m.v
  WHERE m.dist = {max_level})"""]
    for l in range(max_level - 1, -1, -1):
        xs.append(f"""x{l} AS MATERIALIZED (
  SELECT m.sv, m.v, (1 + f.sg * COALESCE(c.t, 0)) / f.sg AS xv
  FROM md m JOIN sgf f ON f.sv = m.sv AND f.v = m.v
  LEFT JOIN (SELECT x.sv, s.dst AS v, SUM(x.xv) AS t
             FROM x{l + 1} x JOIN s ON s.src = x.v
             GROUP BY x.sv, s.dst) c
    ON c.sv = m.sv AND c.v = m.v
  WHERE m.dist = {l})""")
    union = "\nUNION ALL ".join(
        f"SELECT * FROM x{l}" for l in range(max_level + 1))
    return f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seeds AS (SELECT v AS sv FROM d ORDER BY v LIMIT 4),
walk(sv, v, dist) AS (
  SELECT sv, sv, 0 FROM seeds
  UNION
  SELECT walk.sv, s.dst, walk.dist + 1
  FROM walk JOIN s ON s.src = walk.v
  WHERE walk.dist < {max_level}),
md AS MATERIALIZED (SELECT sv, v, MIN(dist) AS dist FROM walk GROUP BY sv, v),
sig(sv, it, v, sg) AS (
  SELECT sv, 0, sv, CAST(1 AS HUGEINT) FROM seeds
  UNION ALL
  SELECT sig.sv, sig.it + 1, s.dst, SUM(sig.sg)
  FROM sig JOIN s ON s.src = sig.v
  JOIN md ON md.sv = sig.sv AND md.v = s.dst AND md.dist = sig.it + 1
  WHERE sig.it < {max_level}
  GROUP BY sig.sv, sig.it + 1, s.dst),
sgf AS MATERIALIZED (SELECT sv, v, CAST(sg AS DOUBLE) AS sg FROM sig),
{','.join(xs)},
xs AS ({union}),
del AS (SELECT x.sv, x.v, f.sg * x.xv - 1 AS delta
        FROM xs x JOIN sgf f ON f.sv = x.sv AND f.v = x.v
        WHERE x.v <> x.sv),
agg AS (SELECT v, SUM(delta) / 2 AS b FROM del GROUP BY v)
SELECT d.v, ROUND(COALESCE(agg.b, 0.0), 6) AS betweenness
FROM d LEFT JOIN agg ON agg.v = d.v"""


def _kmeans_sql(k: int = 8, iters: int = 4) -> str:
    """Unrolled Lloyd k-means CTE chain mirroring
    pgd_ray.stages.clustering.kmeans_fit bit-for-bit: init = k smallest
    vec_ids (cid = rank), assignment = argmin L2 with ties to the
    smallest cid, centroid update = ROUND(SUM/COUNT, 6) per dimension
    (the round-6 stabilization is what makes engine and SQL agree
    despite different summation orders), empty clusters keep their
    previous centroid.  Ends with relation ``af(vec_id, v, cid)``."""
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))""",
    ]
    assign = """{name} AS (SELECT vec_id, v, cid FROM (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_distance(e.v, c.v), c.cid) AS rk
  FROM e CROSS JOIN {cent} c) WHERE rk = 1)"""
    for i in range(1, iters + 1):
        parts.append(assign.format(name=f"a{i}", cent=f"c{i-1}"))
        parts.append(f"""m{i} AS (SELECT cid, dim, ROUND(SUM(x)/COUNT(*), 6) AS cx FROM (
  SELECT cid, CAST(unnest(v) AS DOUBLE) AS x,
         unnest(generate_series(1, len(v))) AS dim FROM a{i}) GROUP BY cid, dim)""")
        parts.append(f"""c{i} AS (SELECT p.cid, COALESCE(l.v, p.v) AS v FROM c{i-1} p
  LEFT JOIN (SELECT cid, list(cx ORDER BY dim) AS v FROM m{i} GROUP BY cid) l
  ON l.cid = p.cid)""")
    parts.append(assign.format(name="af", cent=f"c{iters}"))
    return ",\n".join(parts)


_TOPK_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 4),
sims AS (SELECT q.qid AS query_id, e.vec_id,
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])) AS c
         FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, c,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) - 1 AS BIGINT) AS rank
      FROM sims)
SELECT query_id, rank, vec_id, ROUND(c, 6) AS cosine FROM r WHERE rank < 10"""


def _mmr_sql(k: int = 5) -> str:
    """Unrolled greedy-MMR oracle: stage r picks argmax of
    0.7*cos(q,d) - 0.3*max_{s<r} cos(d, s) over the not-yet-selected
    candidates (ties -> min vec_id) — the engine's exact recurrence,
    with the lambda literals CAST to DOUBLE so both sides compute the
    identical IEEE expression."""
    L = "CAST(0.7 AS DOUBLE)"
    P = "(CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
    ctes = ["""c AS (
  SELECT e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.embedding AS DOUBLE[])) AS simq,
         CAST(e.embedding AS DOUBLE[]) AS emb
  FROM embeddings e,
       (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id <> 0)"""]
    ctes.append(f"s1 AS (SELECT vec_id, {L}*simq AS score, emb FROM c "
                f"ORDER BY {L}*simq DESC, vec_id LIMIT 1)")
    for r in range(2, k + 1):
        prev = [f"s{j}" for j in range(1, r)]
        pens = ", ".join(f"list_cosine_similarity(c.emb, {p}.emb)"
                         for p in prev)
        pen = pens if r == 2 else f"GREATEST({pens})"
        notin = ", ".join(f"{p}.vec_id" for p in prev)
        ctes.append(
            f"s{r} AS (SELECT c.vec_id, {L}*c.simq - {P}*{pen} AS score, "
            f"c.emb FROM c, {', '.join(prev)} "
            f"WHERE c.vec_id NOT IN ({notin}) "
            f"ORDER BY score DESC, c.vec_id LIMIT 1)")
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r - 1} AS BIGINT) AS rank, vec_id, "
        f"ROUND(score, 6) AS score FROM s{r}" for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def _anf_lane_sql() -> tuple[str, str]:
    """(nb-aggregate lane columns, merged-code expression) for the
    HyperANF oracle: 8 packed 6-bit lanes, lane-wise MAX merge."""
    aggs = ", ".join(
        f"MAX((st2.code >> {6 * k}) & 63) AS l{k}" for k in range(8)
    )
    merged = " + ".join(
        f"(GREATEST((st.code >> {6 * k}) & 63, COALESCE(nb.l{k}, 0)) << {6 * k})"
        for k in range(8)
    )
    return aggs, merged


# clean_corpus oracle, split for composition: the CTE chain and the
# survivor SELECT are reused verbatim by the end-to-end curate_corpus
# mirror (clean -> decontaminate -> pack)
_CLEAN_SQL_CTES = r"""st AS (
  SELECT doc_id, token_count,
         ROUND(0.4*least(n_chars/200.0, 1.0)
               + 0.5*(word_count/CAST(greatest(token_count,1) AS DOUBLE))
               + 0.1*(1.0 - digit_count/CAST(greatest(n_chars,1) AS DOUBLE)), 6) AS quality
  FROM (SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS token_count,
               CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS word_count,
               CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_count
        FROM documents)),
lg AS (
  SELECT doc_id, CASE
    WHEN greatest(de, en, es, fr) = 0 THEN 'und'
    WHEN de = greatest(de, en, es, fr) THEN 'de'
    WHEN en = greatest(de, en, es, fr) THEN 'en'
    WHEN es = greatest(de, en, es, fr) THEN 'es'
    ELSE 'fr' END AS lang_pred
  FROM (SELECT doc_id,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> list_contains(['das','den','der','die','ein','ist','mit','nicht','und','zu'], x))) AS de,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> list_contains(['a','and','for','in','is','it','of','that','the','to'], x))) AS en,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> list_contains(['el','es','la','las','los','por','que','un','una','y'], x))) AS es,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> list_contains(['des','est','et','la','le','les','pour','que','un','une'], x))) AS fr
  FROM documents)),
filt AS (
  SELECT d.doc_id, st.token_count, st.quality, md5(d.text) AS h, d.text
  FROM documents d JOIN st USING (doc_id) JOIN lg USING (doc_id)
  WHERE lg.lang_pred = 'en' AND st.quality >= 0.9),
ex AS (
  SELECT * FROM filt
  WHERE doc_id = (SELECT MIN(f2.doc_id) FROM filt f2 WHERE f2.h = filt.h)),
sh AS (
  SELECT doc_id,
    list_distinct([substr(x, i, 5) for i in range(1, greatest(length(x)-3, 2))]) AS gr
  FROM (SELECT doc_id,
        rpad(y, CAST(greatest(length(y), 5) AS INTEGER), ' ') AS x
        FROM (SELECT doc_id,
              regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g') AS y
              FROM ex)) ),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
        (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) >= 0.7),
sym AS (SELECT doc_a AS u, doc_b AS v FROM p
        UNION ALL SELECT doc_b, doc_a FROM p),
walk(v, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT sym.v, walk.comp FROM walk JOIN sym ON sym.u = walk.v),
comp AS (SELECT v, MIN(comp) AS comp FROM walk GROUP BY v)"""

_CLEAN_SQL_FINAL = r"""SELECT e.doc_id, e.token_count, e.quality
FROM ex e LEFT JOIN comp c ON c.v = e.doc_id
WHERE c.comp IS NULL OR c.comp = e.doc_id"""

_CLEAN_SQL = "WITH RECURSIVE\n" + _CLEAN_SQL_CTES + "\n" + _CLEAN_SQL_FINAL

_CURATE_SQL = (
    "WITH RECURSIVE\n" + _CLEAN_SQL_CTES + ",\n"
    + "surv AS (" + _CLEAN_SQL_FINAL + r"""),
w0c AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
        FROM documents),
gc AS (SELECT doc_id, array_to_string(ws[pos:pos+7], ' ') AS gram
       FROM (SELECT doc_id, ws,
                    unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS pos
             FROM w0c)),
bgc AS (SELECT DISTINCT gram FROM gc WHERE doc_id % 50 = 0),
contam AS (SELECT DISTINCT gc.doc_id FROM gc JOIN bgc ON bgc.gram = gc.gram),
keptc AS (SELECT surv.* FROM surv
          LEFT JOIN contam ON contam.doc_id = surv.doc_id
          WHERE contam.doc_id IS NULL),
packedc AS (
  SELECT doc_id, token_count, quality,
         CAST(COALESCE(SUM(token_count) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM keptc)
SELECT doc_id, token_count, quality, start_tok,
       start_tok // 1024 AS pack_id,
       start_tok % 1024 AS pack_offset
FROM packedc"""
)


def oracle_sql() -> dict[str, str]:
    from pgd_ray.text.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    _anf_aggs, _anf_merge = _anf_lane_sql()
    out = {
        "transcripts": f"WITH {_T_CTE} SELECT conv_id, turn_idx, role, text, tool, ts FROM t",
        "transcript_edges": f"WITH {_TE_CTE} SELECT src, dst FROM e",
        "edges_copurchase": f"WITH {_E_CTE} SELECT src, dst FROM e",
        "degree_table": f"WITH {_E_CTE}, {_S_CTE}, {_D_CTE} SELECT v, degree FROM d",
        "graph_stats": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
base AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS m,
                (SELECT CAST(MAX(degree) AS BIGINT) FROM d) AS d_max)
SELECT n, m,
       ROUND(2.0*m / (n*(n-1.0)), 9) AS density,
       d_max,
       ROUND(2.0*m / n, 9) AS d_avg
FROM base""",
        "assortativity": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
j AS (SELECT d1.degree AS dv, d2.degree AS du
      FROM e JOIN d d1 ON d1.v = e.src JOIN d d2 ON d2.v = e.dst),
a AS (SELECT SUM(CAST(dv AS DOUBLE)*du) AS mu,
             SUM((dv+du)/2.0) AS jd,
             SUM((CAST(dv AS DOUBLE)*dv + CAST(du AS DOUBLE)*du)/2.0) AS psi,
             CAST(COUNT(*) AS DOUBLE) AS m FROM j),
rr AS (SELECT CASE WHEN m = 0 THEN 0.0
              ELSE ((mu/m) - (jd/m)*(jd/m)) / ((psi/m) - (jd/m)*(jd/m)) END AS r0, m FROM a)
SELECT ROUND(CASE WHEN m = 0 THEN 0.0
             WHEN isnan(r0) OR r0 < -1.0 OR r0 > 1.0 THEN 1.0
             ELSE r0 END, 9) AS r
FROM rr""",
        "triangle_count": f"""
WITH {_E_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS total_3_tris
FROM e ab JOIN e bc ON ab.dst = bc.src JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst""",
        "edge_triangles": f"""
WITH {_E_CTE}, {_S_CTE}
SELECT e.src, e.dst,
       CAST(COUNT(s2.dst) AS BIGINT) AS triangle
FROM e LEFT JOIN s s1 ON s1.src = e.src
       LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
GROUP BY e.src, e.dst""",
        # graph.graphlets.edge_clustering: Radicchi (tri+1)/(min deg-1),
        # degenerate min(deg)=1 pinned to 0.0 on both sides
        "edge_clustering": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
tri AS (SELECT e.src, e.dst, CAST(COUNT(s2.dst) AS BIGINT) AS triangle
        FROM e LEFT JOIN s s1 ON s1.src = e.src
               LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
        GROUP BY e.src, e.dst)
SELECT t.src, t.dst, t.triangle,
       ROUND(CASE WHEN least(d1.degree, d2.degree) > 1
                  THEN (t.triangle + 1.0)
                       / (least(d1.degree, d2.degree) - 1)
                  ELSE 0.0 END, 9) AS ecc
FROM tri t JOIN d d1 ON d1.v = t.src JOIN d d2 ON d2.v = t.dst""",
        "wedges_cc": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM e ab
       JOIN e bc ON ab.dst = bc.src JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst),
w AS (SELECT CAST(SUM(degree*(degree-1)//2) AS BIGINT) AS wedges FROM d)
SELECT (SELECT wedges FROM w) AS total_wedges,
       ROUND(3.0*(SELECT t FROM tr) / (SELECT wedges FROM w), 9) AS global_cc""",
        "macro_tool_graph": _macro17_sql(
            _TE_CTE, "(SELECT COUNT(DISTINCT tool) FROM t)"
        ),
        "macro_approx_tool_graph": _macro17_approx_sql(
            _TE_CTE, "(SELECT COUNT(DISTINCT tool) FROM t)"
        ),
        "cc_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE},
vtx AS (SELECT DISTINCT src AS v FROM s),
walk(v, comp) AS (
  SELECT v, v FROM vtx
  UNION
  SELECT s.dst, walk.comp FROM walk JOIN s ON s.src = walk.v
)
SELECT v, CAST(MIN(comp) AS BIGINT) AS component FROM walk GROUP BY v""",
        "text_stats": """
WITH b AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS token_count,
         CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS word_count,
         CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_count,
         CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_count
  FROM documents)
SELECT doc_id, n_chars, token_count, word_count, punct_count, digit_count,
       ROUND(0.4*least(n_chars/200.0, 1.0)
             + 0.5*(word_count/CAST(greatest(token_count,1) AS DOUBLE))
             + 0.1*(1.0 - digit_count/CAST(greatest(n_chars,1) AS DOUBLE)), 6) AS quality
FROM b""",
        "fingerprints": """
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS md5
FROM documents""",
        "exact_dedup": """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)""",
        # segment_dedup: aligned 8-word windows (1-based list slice),
        # first occurrence by the packed-position MIN (doc_id*2^20 +
        # seg_idx — exact int64, same pack as the engine), docs
        # rebuilt with ordered string_agg.
        "segment_dedup": """
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words
           FROM documents),
seg AS (SELECT doc_id, CAST(t.i AS BIGINT) AS seg_idx,
               array_to_string(words[t.i*8+1 : t.i*8+8], ' ') AS seg
        FROM w, UNNEST(range(CAST(ceil(len(words)/8.0) AS BIGINT))) AS t(i)),
k AS (SELECT seg, MIN(doc_id * 1048576 + seg_idx) AS pos
      FROM seg WHERE seg <> '' GROUP BY seg),
s AS (SELECT pos // 1048576 AS doc_id, pos % 1048576 AS seg_idx, seg FROM k)
SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
       CAST(COUNT(*) AS BIGINT) AS n_segs
FROM s GROUP BY doc_id""",
        "topk_cosine": _TOPK_SQL,
        # ivf_topk with nprobe == n_centroids is exact → same oracle
        "ivf_topk": _TOPK_SQL,
        "mmr_rerank": _mmr_sql(5),
        # stages.quantization: int8 round-trip — floor(x+0.5) on both
        # sides (numpy round() is half-even, SQL round() is half-away;
        # floor(+0.5) is the portable contract)
        "quantization_error": """
WITH x AS (
  SELECT vec_id,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         unnest(range(len(embedding))) AS dim
  FROM embeddings),
mm AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY dim),
qq AS (SELECT x.vec_id, x.v,
              CASE WHEN mm.mx > mm.mn THEN
                mm.mn + LEAST(GREATEST(FLOOR(
                  (x.v - mm.mn) / ((mm.mx - mm.mn) / 255.0) + 0.5), 0), 255)
                  * ((mm.mx - mm.mn) / 255.0)
              ELSE mm.mn END AS recon
       FROM x JOIN mm ON mm.dim = x.dim)
SELECT vec_id, ROUND(SUM((v - recon) * (v - recon)), 9) AS sse,
       ROUND(MAX(ABS(v - recon)), 9) AS max_abs_err
FROM qq GROUP BY vec_id""",
        "vertex_triangles": f"""
WITH {_E_CTE}, {_S_CTE},
et AS (SELECT e.src, e.dst, COUNT(s2.dst) AS triangle
       FROM e LEFT JOIN s s1 ON s1.src = e.src
              LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
       GROUP BY e.src, e.dst),
up AS (SELECT src AS v, triangle FROM et UNION ALL SELECT dst AS v, triangle FROM et)
SELECT v, CAST(SUM(triangle) // 2 AS BIGINT) AS triangles FROM up GROUP BY v""",
        # graph.graphlets.vertex_orbits3: k=3 GDV —
        # orbit1 = Σ_{{u∈N(v)}}(deg u − 1) − 2·tri,
        # orbit2 = C(deg,2) − tri, orbit3 = tri
        # per-vertex 4-clique / 4-cycle orbits on the tool graph:
        # per-edge micro counts (clique = common-neighbor edge pairs,
        # cycle = induced N(u)\N(v) × N(v)\N(u) edge pairs) folded to
        # vertices with automorphism multiplicities 3 / 2
        "vertex_orbits4_tool": f"""
WITH {_TE_CTE}, {_S_CTE},
pe AS (
  SELECT e.src, e.dst,
    (SELECT COUNT(*) FROM e wx
      WHERE EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.dst)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.dst))
      AS clq,
    (SELECT COUNT(*) FROM s sw, s sx, s wx
      WHERE sw.src = e.dst AND sx.src = e.src
        AND wx.src = sw.dst AND wx.dst = sx.dst
        AND sw.dst <> e.src AND sx.dst <> e.dst
        AND NOT EXISTS (SELECT 1 FROM s q
                        WHERE q.src = e.src AND q.dst = sw.dst)
        AND NOT EXISTS (SELECT 1 FROM s q
                        WHERE q.src = e.dst AND q.dst = sx.dst)) AS cyc
  FROM e),
up AS (SELECT src AS v, clq, cyc FROM pe
       UNION ALL SELECT dst AS v, clq, cyc FROM pe)
SELECT v, CAST(SUM(clq) // 3 AS BIGINT) AS clique4,
       CAST(SUM(cyc) // 2 AS BIGINT) AS cycle4
FROM up GROUP BY v ORDER BY v""",
        # graph.graphlets.orbit_spearman — see _orbit_spearman_sql
        "orbit_spearman": _orbit_spearman_sql(),
        "vertex_orbits3": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}, {_VT_STREAM_CTE},
sn AS (SELECT s.src AS v, CAST(SUM(d2.degree) AS BIGINT) AS snbr
       FROM s JOIN d d2 ON d2.v = s.dst GROUP BY 1)
SELECT d.v,
       CAST(d.degree AS BIGINT) AS orbit0_degree,
       CAST(sn.snbr - d.degree - 2 * vt.tri AS BIGINT)
         AS orbit1_path_end,
       CAST(d.degree * (d.degree - 1) // 2 - vt.tri AS BIGINT)
         AS orbit2_wedge_center,
       vt.tri AS orbit3_triangle
FROM d JOIN vt ON vt.v = d.v JOIN sn ON sn.v = d.v
ORDER BY d.v""",
        # all 2-decimal columns summed as EXACT integer units (the
        # q7/q9 order-dependent-float-sum class), one division each
        "tpch_q1": f"""
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS q100,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p100,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d100,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS t100
  FROM lineitem WHERE epoch_us(l_shipdate) <= {_Q1_CUTOFF_US})
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(q100) AS DOUBLE) / 100.0, 2) AS sum_qty,
       ROUND(CAST(SUM(p100) AS DOUBLE) / 100.0, 2) AS sum_base_price,
       ROUND(CAST(SUM(p100 * (100 - d100)) AS DOUBLE) / 10000.0, 2)
           AS sum_disc_price,
       ROUND(CAST(SUM(p100 * (100 - d100) * (100 + t100)) AS DOUBLE)
             / 1000000.0, 2) AS sum_charge,
       ROUND(CAST(SUM(q100) AS DOUBLE) / (100.0 * COUNT(*)), 6) AS avg_qty,
       ROUND(CAST(SUM(p100) AS DOUBLE) / (100.0 * COUNT(*)), 6)
           AS avg_price,
       ROUND(CAST(SUM(d100) AS DOUBLE) / (100.0 * COUNT(*)), 6)
           AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM u GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3": f"""
SELECT l.l_orderkey,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 6) AS revenue,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate,
       o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND epoch_us(o.o_orderdate) < {_Q3_CUTOFF_US}
  AND epoch_us(l.l_shipdate) > {_Q3_CUTOFF_US}
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l.l_orderkey
LIMIT 10""",
        "tpch_q5": f"""
SELECT n.n_name,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
     JOIN supplier s ON l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
     JOIN nation n ON s.s_nationkey = n.n_nationkey
     JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND epoch_us(o.o_orderdate) >= {_Q5_LO_US}
  AND epoch_us(o.o_orderdate) < {_Q5_HI_US}
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name""",
        "tpch_q6": f"""
SELECT COALESCE(ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * CAST(ROUND(l_discount * 100) AS BIGINT))
                       AS DOUBLE) / 10000.0, 2), 0.0) AS revenue
FROM lineitem
WHERE epoch_us(l_shipdate) >= {_Q5_LO_US}
  AND epoch_us(l_shipdate) < {_Q5_HI_US}
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24""",
        "tpch_q8": f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN s_nation = 'NATION_2' THEN vol4
                           ELSE 0 END) AS DOUBLE)
             / CAST(SUM(vol4) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS vol4,
         n2.n_name AS s_nation
  FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
       JOIN region r ON n1.n_regionkey = r.r_regionkey
       JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND epoch_us(o.o_orderdate) >= {_Q5_LO_US}
    AND epoch_us(o.o_orderdate) < {_Q8_HI_US})
GROUP BY o_year""",
        "tpch_q15": f"""
WITH rev AS (
  SELECT l_suppkey,
         ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0, 2) AS total_revenue
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {_Q5_LO_US}
    AND epoch_us(l_shipdate) < {_Q15_HI_US}
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
        # tpch_q17: brand-only predicate (slim schema has no
        # p_container); threshold 0.2·AVG via exact integer-valued
        # double sums on both sides.
        "tpch_q17": """
SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
           AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT CAST(0.2 AS DOUBLE) * (SUM(l2.l_quantity) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""",
        "cooccurrence": """
SELECT least(a.event_type, b.event_type) AS type_a,
       greatest(a.event_type, b.event_type) AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
GROUP BY 1, 2""",
        # text.entropy.lexical_diversity: token histogram per doc
        "lexical_diversity": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
  FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS types FROM cnt GROUP BY 1),
ent AS (SELECT cnt.doc_id,
               -SUM((CAST(c AS DOUBLE) / n.n) * ln(CAST(c AS DOUBLE) / n.n))
                 AS entropy,
               -- simpson = SUM(c^2)/n^2: the numerator sums EXACT
               -- integers (float SUM of (c/n)^2 is order-dependent
               -- and straddled the digit-6 boundary at sf0.1)
               CAST(SUM(c * c) AS DOUBLE)
                 / (CAST(ANY_VALUE(n.n) AS DOUBLE)
                    * CAST(ANY_VALUE(n.n) AS DOUBLE)) AS simpson
        FROM cnt JOIN n ON n.doc_id = cnt.doc_id GROUP BY 1)
SELECT d.doc_id,
       COALESCE(n.n, 0) AS n_tokens, COALESCE(n.types, 0) AS n_types,
       ROUND(COALESCE(ent.entropy, 0), 6) AS entropy,
       ROUND(COALESCE(ent.simpson, 0), 6) AS simpson,
       ROUND(COALESCE(CAST(n.types AS DOUBLE) / n.n, 0), 6) AS ttr
FROM documents d
LEFT JOIN n ON n.doc_id = d.doc_id
LEFT JOIN ent ON ent.doc_id = d.doc_id""",
        # stages.features.user_activity_features: one hash aggregation
        # value is integer cents stored as double: both sides sum the
        # exact BIGINT cents and divide once — float SUM/AVG is
        # combine-order-dependent at digit-6 rounding boundaries
        "user_activity": """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 6) AS total_value,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * COUNT(*)), 6) AS mean_value
FROM events GROUP BY user_id""",
        # text.sampling.weighted_sample_topk: A-ES keys u^(1/w) ranked
        # by the monotone ln(u)/w; u = (splitmix64(doc_id)>>11 + 1)/2^53
        # — bit-identical to the engine (division by 2^53 is exact)
        "weighted_sample": f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
         ln((CAST(({_splitmix_sql('doc_id', '0')} >> 11) AS DOUBLE) + 1.0)
            / 9007199254740992.0) / n_chars AS score
  FROM documents)
SELECT doc_id, n_chars, ROUND(s.score, 6) AS score
FROM s ORDER BY s.score DESC, doc_id LIMIT 50""",
        # stages.windows.trigram_counts: double LEAD mirror
        "trigrams": """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type AS type_a, t1 AS type_b, t2 AS type_c,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams
FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2, 3""",
        # graph.degrees.degree_histogram_log2
        "degree_histogram": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}
SELECT CAST(FLOOR(log2(degree)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM d GROUP BY 1""",
        # graph.degrees.hill_alpha at d_min = 64
        "hill_alpha": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}
SELECT CAST(64 AS BIGINT) AS d_min, CAST(COUNT(*) AS BIGINT) AS k_tail,
       ROUND(1.0 + COUNT(*) / (SUM(ln(CAST(degree AS DOUBLE)))
                               - COUNT(*) * ln(64.0)), 6) AS alpha
FROM d WHERE degree >= 64""",
        # stages.quantiles.grouped_quantiles: exact per-group rank rule
        # floor(q*(n-1)) — value identity, no interpolation, so the
        # histogram-refined engine value matches the sorted rank value
        "grouped_quantiles": """
WITH v AS (SELECT event_type, value,
                  row_number() OVER (
                    PARTITION BY event_type ORDER BY value) - 1 AS rk,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
qq AS (SELECT * FROM (VALUES (0.5), (0.9)) t(q))
SELECT event_type, q, value FROM v, qq
WHERE rk = CAST(floor(q * (n - 1)) AS BIGINT)""",
        # mad_outliers: robust per-type screen — median and MAD under
        # the engine's rank-(floor(q*(n-1))) rule (the
        # grouped_quantiles window shape, twice), strict
        # ABS(x-med) > 3*mad in the same IEEE doubles.
        "mad_outliers": """
WITH v AS (SELECT event_type, value,
                  row_number() OVER (
                    PARTITION BY event_type ORDER BY value) - 1 AS rk,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
med AS (SELECT event_type, value AS med FROM v
        WHERE rk = CAST(floor(0.5 * (n - 1)) AS BIGINT)),
a AS (SELECT e.event_type, e.value, ABS(e.value - m.med) AS av, m.med
      FROM v e JOIN med m USING (event_type)),
a2 AS (SELECT event_type, av,
              row_number() OVER (
                PARTITION BY event_type ORDER BY av) - 1 AS rk,
              COUNT(*) OVER (PARTITION BY event_type) AS n
       FROM a),
mad AS (SELECT event_type, av AS mad FROM a2
        WHERE rk = CAST(floor(0.5 * (n - 1)) AS BIGINT))
SELECT a.event_type, ROUND(ANY_VALUE(a.med), 9) AS med,
       ROUND(ANY_VALUE(mad.mad), 9) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN a.av > 3.0 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM a JOIN mad USING (event_type)
GROUP BY a.event_type""",
        # text.analysis.zipf_slope: OLS of ln(count) on ln(rank)
        "zipf_slope": """
WITH tok AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS token
             FROM documents),
top AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM tok GROUP BY token ORDER BY n_total DESC, token LIMIT 100),
r AS (SELECT ln(CAST(row_number() OVER (
                 ORDER BY n_total DESC, token) AS DOUBLE)) AS x,
             ln(CAST(n_total AS DOUBLE)) AS y
      FROM top)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(y, x), 6) AS slope,
       ROUND(regr_intercept(y, x), 6) AS intercept
FROM r""",
        # stages.kmv: bottom-256 splitmix values over event_id —
        # integer-exact through the k-th minimum; estimator
        # (k-1)·2^64/h_k with the identical double conversion
        "kmv_events": f"""
WITH h AS (SELECT DISTINCT {_splitmix_sql('event_id', '0')} AS hv
           FROM events),
b AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
kth AS (SELECT MAX(hv) AS kh, COUNT(*) AS n FROM b)
SELECT CAST(n AS BIGINT) AS k_used,
       CASE WHEN n < 256 THEN CAST(0 AS BIGINT)
            ELSE CAST(kh >> 1 AS BIGINT) END AS kth_hash,
       CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
            ELSE ROUND(255 * 18446744073709551616.0
                       / CAST(kh AS DOUBLE), 6) END AS est_distinct
FROM kth""",
        # stages.windows.transition_counts: adjacent same-user pairs
        "transitions": """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS type_from, nxt AS type_to,
       CAST(COUNT(*) AS BIGINT) AS n_trans
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""",
        # pipelines.tpch.q4: EXISTS semi-join, distributed strategy
        "local_cc": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}, {_VT_STREAM_CTE}
SELECT d.v, d.degree, vt.tri AS triangles,
       ROUND(CASE WHEN d.degree >= 2
             THEN 2.0 * vt.tri / (d.degree * (d.degree - 1.0))
             ELSE 0.0 END, 6) AS local_cc
FROM d JOIN vt ON vt.v = d.v""",
        "hopping_counts": """
WITH o AS (SELECT unnest(generate_series(0, 3)) AS i)
SELECT event_type,
       CAST((epoch_us(ts) // 900000000 - o.i) * 900000000 AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 6) AS sum_value
FROM events CROSS JOIN o
GROUP BY event_type, window_start""",
        "heavy_hitters": """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
           FROM events GROUP BY user_id, event_type),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n_events DESC, event_type) AS rnk
      FROM c)
SELECT user_id, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3""",
        "sample_docs": """
SELECT doc_id, n_chars, substr(md5(text), 1, 4) AS h4
FROM documents WHERE substr(md5(text), 1, 4) < '4000'""",
        "vocab_topk": """
WITH tok AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS token
             FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_total
FROM tok GROUP BY token
ORDER BY n_total DESC, token LIMIT 100""",
        "distinct_users": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type""",
        # bit-exact mirror of the HLL register computation: same
        # splitmix64, bucket = top 12 bits, rho = 52-bit leading-zero
        # rank via exact integer bit length (bin()), max per bucket
        "hll_users": f"""
WITH h AS (SELECT {_splitmix_sql('user_id', '0')} AS h
           FROM events WHERE user_id IS NOT NULL),
parts AS (SELECT CAST(h >> 52 AS BIGINT) AS bucket,
                 h & ((1::UBIGINT << 52) - 1) AS w FROM h),
r AS (SELECT bucket, CASE WHEN w = 0 THEN 53
                          ELSE 52 - length(bin(w)) + 1 END AS rho FROM parts)
SELECT bucket, CAST(MAX(rho) AS BIGINT) AS rho FROM r GROUP BY bucket""",
        "embedding_dim_stats": """
WITH e AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  unnest(generate_series(1, len(embedding))) AS p
           FROM embeddings),
a AS (SELECT p - 1 AS dim, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss,
             MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY p)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
       ROUND(s / n, 6) AS mean,
       ROUND(SQRT(GREATEST(ss / n - (s / n) * (s / n), 0)), 6) AS std,
       ROUND(mn, 6) AS vmin, ROUND(mx, 6) AS vmax
FROM a""",
        # tfidf_top5: per-doc top-5 terms by tf·ln(N/df), ties broken
        # by term — integer tf/df make within-system ties exact, so
        # the rank-5 cutoff agrees across engines.
        "tfidf_top5": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
w AS (SELECT doc_id, unnest(ws) AS t FROM w0),
tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
       FROM w GROUP BY doc_id, t),
dfr AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM w GROUP BY t),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.t AS term, tf.tf,
              tf.tf * ln((SELECT n FROM nn) / dfr.df) AS x,
              row_number() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.tf * ln((SELECT n FROM nn) / dfr.df) DESC,
                         tf.t) AS rk
       FROM tf JOIN dfr ON dfr.t = tf.t)
SELECT doc_id, term, tf, ROUND(x, 6) AS tfidf FROM sc WHERE rk <= 5""",
        # bm25_rank: Okapi BM25 (Lucene idf) for a fixed 3-term query,
        # ranked on the ROUNDED score with doc_id tie-break — the
        # expression tree mirrors text/bm25.py term by term.
        "bm25_rank": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w0),
w AS (SELECT doc_id, unnest(ws) AS t FROM w0),
q AS (SELECT unnest(['table', 'sort', 'hash']) AS t),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(SUM(dl) AS DOUBLE) AS lsum FROM dl),
dfr AS (SELECT q.t, CAST(COUNT(DISTINCT w.doc_id) AS BIGINT) AS df
        FROM q LEFT JOIN w ON w.t = q.t GROUP BY q.t),
tf AS (SELECT w.doc_id, w.t, CAST(COUNT(*) AS BIGINT) AS tf
       FROM w JOIN q ON q.t = w.t GROUP BY w.doc_id, w.t),
sc AS (SELECT tf.doc_id,
              SUM(ln(1 + ((SELECT n FROM st) - dfr.df + 0.5) / (dfr.df + 0.5))
                  * tf.tf * (1.2 + 1)
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl /
                       ((SELECT lsum FROM st) / (SELECT n FROM st))))) AS s
       FROM tf JOIN dfr ON dfr.t = tf.t JOIN dl ON dl.doc_id = tf.doc_id
       GROUP BY tf.doc_id),
r AS (SELECT doc_id, ROUND(s, 6) AS score,
             row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS rk
      FROM sc WHERE ROUND(s, 6) > 0)
SELECT doc_id, score, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 20""",
        # decontaminate: docs sharing any token 8-gram with the
        # benchmark slice (doc_id % 50 == 0); n_shared = DISTINCT
        # shared 8-grams.  1-based inclusive list slice ws[p:p+7] is
        # the 8-token window.
        "decontaminate": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
g AS (SELECT doc_id, array_to_string(ws[pos:pos+7], ' ') AS gram
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS pos
            FROM w0)),
bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
sc AS (SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
       FROM g JOIN bg ON bg.gram = g.gram GROUP BY g.doc_id)
SELECT d.doc_id, CAST(COALESCE(sc.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(sc.n_shared, 0) = 0 AS keep
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""",
        # bigram_lm: mean bigram log-likelihood per doc under the
        # corpus' own bigram MLE — ln(c(w1,w2)/cfirst(w1)) averaged
        # over a doc's bigrams; <2-token docs score 0.0 with 0
        # bigrams.  Same [A-Za-z]+ tokenizer as repetition_stats.
        "bigram_lm": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS pos FROM w0),
bg AS (SELECT x.doc_id, x.w AS w1, y.w AS w2
       FROM w x JOIN w y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
cf AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cfirst FROM bc GROUP BY w1),
sc AS (SELECT bg.doc_id, COUNT(*) AS nb,
              SUM(ln(bc.c / CAST(cf.cfirst AS DOUBLE))) AS lsum
       FROM bg JOIN bc ON bc.w1 = bg.w1 AND bc.w2 = bg.w2
               JOIN cf ON cf.w1 = bg.w1
       GROUP BY bg.doc_id)
SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
       ROUND(COALESCE(sc.lsum / sc.nb, 0.0), 6) AS logprob
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""",
        "repetition_stats": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS pos FROM w0),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
a AS (SELECT doc_id, SUM(c) AS nw, COUNT(*) AS nd, MAX(c) AS topc
      FROM wc GROUP BY doc_id),
g AS (SELECT x.doc_id, x.w || ' ' || y.w || ' ' || z.w AS tri
      FROM w x JOIN w y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
               JOIN w z ON z.doc_id = x.doc_id AND z.pos = x.pos + 2),
ga AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT tri) AS d3
       FROM g GROUP BY doc_id),
j AS (SELECT d.doc_id,
             CAST(COALESCE(a.nw, 0) AS BIGINT) AS n_words,
             ROUND(CASE WHEN COALESCE(a.nw, 0) = 0 THEN 0.0
                   ELSE 1.0 - a.nd / CAST(a.nw AS DOUBLE) END, 6)
                 AS dup_word_frac,
             ROUND(CASE WHEN COALESCE(a.nw, 0) = 0 THEN 0.0
                   ELSE a.topc / CAST(a.nw AS DOUBLE) END, 6)
                 AS top_word_frac,
             ROUND(CASE WHEN COALESCE(ga.n3, 0) = 0 THEN 0.0
                   ELSE 1.0 - ga.d3 / CAST(ga.n3 AS DOUBLE) END, 6)
                 AS dup_3gram_frac
      FROM documents d LEFT JOIN a USING (doc_id) LEFT JOIN ga USING (doc_id))
SELECT *, (dup_word_frac <= 0.30 AND top_word_frac <= 0.20
           AND dup_3gram_frac <= 0.30) AS keep
FROM j""",
        "pack_assignments": """
WITH t AS (SELECT doc_id,
                  CAST(length(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
                       AS BIGINT) AS n_tokens
           FROM documents),
s AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_tok
      FROM t)
SELECT doc_id, n_tokens, start_tok,
       start_tok // 1024 AS pack_id,
       start_tok % 1024 AS pack_offset
FROM s""",
        "stratified_docs": """
SELECT doc_id, lang, substr(md5(text), 1, 4) AS h4
FROM documents
WHERE text IS NOT NULL
  AND substr(md5(text), 1, 4) <
      CASE lang WHEN 'en' THEN '4000' WHEN 'zh' THEN 'c000' ELSE '8000' END""",
        "cap_per_source": """
WITH r AS (SELECT source, doc_id, md5(text) AS md5,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY md5(text), doc_id) AS rnk
           FROM documents WHERE text IS NOT NULL)
SELECT source, doc_id, md5, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5""",
        "quantiles_value": """
WITH qs(q) AS (VALUES (0.01),(0.25),(0.5),(0.75),(0.9),(0.99)),
n AS (SELECT COUNT(*) AS c FROM events),
s AS (SELECT value AS x, row_number() OVER (ORDER BY value) - 1 AS r FROM events)
SELECT CAST(qs.q AS DOUBLE) AS q, ROUND(s.x, 6) AS value
FROM qs, n, s WHERE s.r = CAST(floor(qs.q * (n.c - 1)) AS BIGINT)""",
        # funnel_events: strict ordered funnel — step k's time is the
        # user's MIN event time of that type strictly after their
        # step-(k-1) time; counts = completing users per step.
        "funnel_events": """
WITH t1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN t1 ON t1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN t2 ON t2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS users FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM t2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM t3""",
        "tumbling_counts": """
SELECT event_type,
       CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 6) AS sum_value
FROM events GROUP BY event_type, window_start""",
        "sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
o AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM o),
g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS sidx FROM f)
SELECT user_id,
       CAST(sidx AS BIGINT) AS session_idx,
       CAST(MIN(ts) AS BIGINT) AS start_ts,
       CAST(MAX(ts) AS BIGINT) AS end_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, sidx""",
        # stages.windows.window_functions: the PARTITION BY / ORDER BY
        # trio; lag COALESCEd to 0.0 exactly like the engine's per-key
        # first-row default.
        "window_functions": """
SELECT user_id, event_id, value,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_number,
       ROUND(SUM(value) OVER w, 6) AS cum_sum,
       COALESCE(LAG(value) OVER w, 0.0) AS lag_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""",
        # stages.windows.rolling_aggregate: ROWS frame of 5
        "rolling_windows": """
SELECT user_id, event_id, value,
       ROUND(SUM(value) OVER w, 6) AS roll_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_cnt,
       ROUND(AVG(value) OVER w, 6) AS roll_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
        # stages.retention.cohort_retention: distinct (user, week)
        # pairs -> per-user first week -> (cohort, offset) counts
        "retention": """
WITH uw AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS wk FROM events),
c AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id)
SELECT CAST(c.cw AS BIGINT) AS cohort_week,
       CAST(uw.wk - c.cw AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS users
FROM uw JOIN c ON c.user_id = uw.user_id
GROUP BY 1, 2""",
        # pipelines.tpch.q4: EXISTS semi-join, distributed strategy
        "tpch_q4": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority""",
        # pipelines.tpch.q13: LEFT JOIN order-count histogram
        "tpch_q13": """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
        # pipelines.tpch.q7: cross-nation volume by ship year
        # volume summed as EXACT 1e-4-dollar integers (price = cents,
        # discount = percent) — float SUM is combine-order-dependent
        # at the cent rounding boundary; the engine sums the same ints
        "tpch_q7": """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(vol4) AS DOUBLE) / 10000.0, 2) AS revenue FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS vol4
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3'))
    AND epoch_us(l_shipdate) >= 788918400000000
    AND epoch_us(l_shipdate) < 1009843200000000) sh
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3""",
        # pipelines.tpch.q10: returned-item revenue top-20; ORDER BY
        # the rounded alias — same contract as the engine's sort
        "tpch_q10": """
SELECT c_custkey, c_name,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE epoch_us(o_orderdate) >= 820454400000000
  AND epoch_us(o_orderdate) < 852076800000000
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
        # pipelines.tpch.q18: large-volume orders, HAVING > 250
        "tpch_q18": """
SELECT c_custkey, c_name, o_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate,
       o_totalprice, ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 250
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100""",
        # pipelines.tpch.q19: disjunctive predicates, broadcast part dims
        "tpch_q19": """
SELECT ROUND(COALESCE(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE), 0) / 10000.0, 2)
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 40
       AND l_quantity BETWEEN 20 AND 30)""",
        # pipelines.tpch.q21: EXISTS + NOT-EXISTS shape on the slim
        # schema (returned lineitem stands in for the late lineitem)
        "tpch_q21": """
WITH ps AS (
  SELECT l_orderkey AS o, l_suppkey AS s,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_r
  FROM lineitem GROUP BY 1, 2),
po AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS n_supp,
              CAST(SUM(CASE WHEN n_r > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_supp_r
       FROM ps GROUP BY 1),
w AS (SELECT ps.s, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM ps JOIN po ON po.o = ps.o
      WHERE ps.n_r > 0 AND po.n_supp > 1 AND po.n_supp_r = 1
      GROUP BY 1)
SELECT sup.s_name, w.numwait
FROM w JOIN supplier sup ON sup.s_suppkey = w.s
ORDER BY w.numwait DESC, sup.s_name LIMIT 20""",
        # pipelines.tpch.q22: scalar subquery + NOT EXISTS anti-join;
        # cntrycode = c_custkey % 10 (slim schema has no c_phone)
        "tpch_q22": """
SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS totacctbal
FROM customer
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
        * (SELECT COUNT(*) FROM customer
           WHERE ROUND(c_acctbal * 100) > 0)
      > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
         FROM customer WHERE ROUND(c_acctbal * 100) > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > 450000.0)
GROUP BY 1
ORDER BY cntrycode""",
        # pipelines.tpch.q2: lineitem distinct (partkey, suppkey)
        # pairs stand in for partsupp; supply cost = MIN(extendedprice)
        "tpch_q2": """
WITH cost AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, MIN(l_extendedprice) AS c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  GROUP BY 1, 2)
SELECT s_acctbal, s_name, n_name,
       CAST(cost.pk AS BIGINT) AS p_partkey, ROUND(cost.c, 2) AS cost
FROM cost
JOIN supplier ON cost.sk = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE cost.c = (SELECT MIN(c2.c) FROM cost c2 WHERE c2.pk = cost.pk)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
        # pipelines.tpch.q9: profit = discounted revenue (slim schema
        # has no ps_supplycost); nation = supplier's nation
        "tpch_q9": """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
        # pipelines.tpch.q11: per-part value = shipped-quantity sum
        # for NATION_3 suppliers (slim schema has no ps_availqty)
        "tpch_q11": """
WITH v AS (
  SELECT l_partkey, SUM(l_quantity) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3' GROUP BY 1)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey, ROUND(val, 2) AS value
FROM v WHERE val > 0.0005 * (SELECT SUM(val) FROM v)
ORDER BY value DESC, p_partkey""",
        # pipelines.tpch.q16: distinct (pk, sk) lineitem pairs stand
        # in for partsupp; complaint suppliers = suppkey % 4 == 0
        "tpch_q16": """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey % 4 <> 0
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        # pipelines.tpch.q20: excess stock = windowed per-(pk, sk)
        # quantity sum above a constant (no ps_availqty to halve)
        "tpch_q20": """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3' AND s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey HAVING SUM(l_quantity) > 20.0)
ORDER BY s_name""",
        # text.textrank.textrank_keywords: PageRank (300 fixed rounds,
        # the pagerank_copurchase contract) over distinct adjacent
        # [A-Za-z]+ co-occurrence pairs within the top-200 vocabulary;
        # bigrams via the zipped-unnest (lst, lst[2:]) trick
        "textrank_keywords": """
WITH RECURSIVE
lst AS (SELECT regexp_extract_all(text, '[A-Za-z]+') AS l
        FROM documents WHERE text IS NOT NULL),
tokc AS (SELECT unnest(l) AS tok FROM lst),
vocab AS (SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM tokc GROUP BY 1)
          ORDER BY n DESC, tok LIMIT 200),
bi AS (SELECT a, b FROM (SELECT unnest(l) AS a, unnest(l[2:]) AS b FROM lst)
       WHERE b IS NOT NULL),
e0 AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi FROM bi
       WHERE a <> b AND a IN (SELECT tok FROM vocab)
         AND b IN (SELECT tok FROM vocab)
       GROUP BY 1, 2),
s AS (SELECT lo AS src, hi AS dst FROM e0
      UNION ALL SELECT hi, lo FROM e0),
d AS (SELECT src AS w FROM s GROUP BY 1),
deg AS (SELECT src AS w, CAST(COUNT(*) AS DOUBLE) AS degree
        FROM s GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
pr(it, w, score) AS (
  SELECT 0, w, 1.0/(SELECT n FROM nn) FROM d
  UNION ALL
  SELECT it+1, s.dst, 0.15/(SELECT n FROM nn) + 0.85*SUM(pr.score/deg.degree)
  FROM pr JOIN s ON s.src = pr.w JOIN deg ON deg.w = pr.w
  WHERE it < 300 GROUP BY it+1, s.dst)
SELECT w AS word, ROUND(score, 9) AS score FROM pr WHERE it = 300
ORDER BY score DESC, word""",
        # text.rake.rake_keyphrases: islands of non-stopword [a-z]+
        # tokens (gaps-and-islands over positions from the zipped
        # range-unnest), word deg/freq, phrase = sum of member scores
        "rake_keyphrases": """
WITH tk AS (
  SELECT rid, unnest(l) AS tok, unnest(range(1, len(l)+1)) AS pos
  FROM (SELECT row_number() OVER () AS rid,
               regexp_extract_all(lower(text), '[a-z]+') AS l
        FROM documents WHERE text IS NOT NULL)),
nw AS (SELECT rid, tok, pos,
              CAST(pos AS BIGINT)
                - row_number() OVER (PARTITION BY rid ORDER BY pos) AS isl
       FROM tk
       WHERE tok NOT IN ('the','a','an','and','or','of','to','in','on',
                         'for','with','is','are','was','were','be',
                         'been','as','at','by','from','it','this',
                         'that','these','those')),
ph AS (SELECT rid, isl, string_agg(tok, ' ' ORDER BY pos) AS phrase,
              CAST(COUNT(*) AS BIGINT) AS plen
       FROM nw GROUP BY rid, isl),
wrd AS (SELECT nw.tok, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(ph.plen) AS BIGINT) AS deg
        FROM nw JOIN ph ON ph.rid = nw.rid AND ph.isl = nw.isl
        GROUP BY nw.tok),
occ AS (SELECT ph.phrase, ph.plen, nw.rid, nw.isl,
               SUM(CAST(w.deg AS DOUBLE) / w.freq) AS s
        FROM nw JOIN ph ON ph.rid = nw.rid AND ph.isl = nw.isl
        JOIN wrd w ON w.tok = nw.tok
        GROUP BY 1, 2, 3, 4)
SELECT phrase, CAST(plen AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS freq,
       ROUND(MAX(s), 9) AS score
FROM occ GROUP BY phrase, plen
ORDER BY score DESC, phrase LIMIT 100""",
        # stages.conv_stats.conv_profile over the derived transcripts
        "conv_profile": f"""
WITH {_T_CTE},
base AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
                CAST(COUNT(DISTINCT role) AS BIGINT) AS n_roles,
                CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools,
                CAST(SUM(length(COALESCE(text, ''))) AS BIGINT)
                  AS n_chars,
                MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
         FROM t GROUP BY 1)
SELECT conv_id, n_turns, n_roles, n_tools, n_chars,
       ROUND(CAST(n_chars AS DOUBLE) / n_turns, 6) AS avg_chars,
       CAST((t1 - t0) // 1000000 AS BIGINT) AS span_s
FROM base ORDER BY conv_id""",
        # stages.conv_stats.response_latency: gap to the previous turn
        # attributed to the LATER turn's role
        "response_latency": f"""
WITH {_T_CTE},
g AS (SELECT role,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
      FROM t)
SELECT role, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
         AS mean_gap_s
FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY role""",
        # stages.diff.table_diff vs the deterministic mutation
        "table_diff_events": """
WITH olds AS (SELECT event_id, event_type, props FROM events),
news AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 101 = 0 THEN 'MUTATED' ELSE props END
           AS props
  FROM events WHERE event_id % 97 <> 0
  UNION ALL
  SELECT event_id + 1000000000, event_type,
         CASE WHEN event_id % 101 = 0 THEN 'MUTATED' ELSE props END
  FROM events WHERE event_id % 97 <> 0 AND event_id % 103 = 0),
ha AS (SELECT event_id AS k,
              md5(COALESCE(event_type, '') || '|' || COALESCE(props, ''))
                AS h FROM olds),
hb AS (SELECT event_id AS k,
              md5(COALESCE(event_type, '') || '|' || COALESCE(props, ''))
                AS h FROM news),
j AS (SELECT ha.k AS ka, hb.k AS kb, ha.h AS h_a, hb.h AS h_b
      FROM ha FULL OUTER JOIN hb ON hb.k = ha.k)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM olds) AS n_old,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM news) AS n_new,
       CAST(SUM(CASE WHEN ka IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(SUM(CASE WHEN kb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                      AND h_a <> h_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                      AND h_a = h_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged
FROM j""",
        # 64-bucket splitmix skew histogram over user_id
        "key_skew": f"""
SELECT CAST({_splitmix_sql('user_id', '0')} % 64 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY bucket""",
        # stages.profile.table_profile over events; column order fixed
        "profile_events": """
WITH p AS (
  SELECT 1 AS ord, 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
  FROM events
  UNION ALL
  SELECT 2, 'ts', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(ts) AS BIGINT),
         CAST(COUNT(DISTINCT ts) AS BIGINT) FROM events
  UNION ALL
  SELECT 3, 'user_id', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
         CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
  UNION ALL
  SELECT 4, 'event_type', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
         CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events
  UNION ALL
  SELECT 5, 'value', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(value) AS BIGINT),
         CAST(COUNT(DISTINCT value) AS BIGINT) FROM events
  UNION ALL
  SELECT 6, 'props', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(props) AS BIGINT),
         CAST(COUNT(DISTINCT props) AS BIGINT) FROM events)
SELECT col AS "column", n_rows, n_null, n_distinct
FROM p ORDER BY ord""",
        # stages.conv_stats.conversations_to_documents
        "conv_docs": f"""
WITH {_T_CTE}
SELECT conv_id,
       string_agg(COALESCE(text, ''), chr(10) ORDER BY turn_idx)
         AS text,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM t GROUP BY conv_id ORDER BY conv_id""",
        # stages.conv_stats.tool_transitions: LEAD over (conv, turn)
        "tool_transitions": f"""
WITH {_T_CTE},
g AS (SELECT tool AS tool_a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS tool_b
      FROM t)
SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n_trans
FROM g WHERE tool_b IS NOT NULL
GROUP BY 1, 2 ORDER BY tool_a, tool_b""",
        # text.boilerplate.boilerplate_lines: chr(10) split, pinned
        # ASCII-whitespace trim, per-doc distinct, dup = >= 2 docs
        "boilerplate_lines": """
WITH dl AS (
  SELECT DISTINCT doc_id,
         trim(unnest(string_split(text, chr(10))),
              ' ' || chr(9) || chr(13) || chr(10) || chr(11) || chr(12))
           AS line
  FROM documents WHERE text IS NOT NULL),
dl2 AS (SELECT doc_id, line FROM dl WHERE line <> ''),
cnt AS (SELECT line, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM dl2 GROUP BY 1),
per AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler
        FROM dl2 d JOIN cnt c USING (line) GROUP BY 1)
SELECT doc.doc_id, COALESCE(per.n_lines, 0) AS n_lines,
       COALESCE(per.n_boiler, 0) AS n_boiler,
       ROUND(COALESCE(CAST(per.n_boiler AS DOUBLE) / per.n_lines, 0), 6)
         AS boiler_frac
FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id
ORDER BY doc.doc_id""",
        # graph.graphlets.motif_significance: configuration-model
        # expected triangles S2³/(6·S1³) via HUGEINT cubes
        "motif_significance": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM e ab
       JOIN e bc ON ab.dst = bc.src
       JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
              CAST(SUM(degree) AS HUGEINT) AS s1,
              CAST(SUM(degree * (degree - 1)) AS HUGEINT) AS s2
       FROM d)
SELECT nv AS n_vertices, CAST(s1 // 2 AS BIGINT) AS m_edges,
       (SELECT t FROM tr) AS triangles,
       CAST(s2 // 2 AS BIGINT) AS wedges,
       ROUND(CAST(s2 * s2 * s2 AS DOUBLE)
             / (6.0 * CAST(s1 * s1 * s1 AS DOUBLE)), 9)
         AS expected_tri_cfg,
       ROUND(CAST((SELECT t FROM tr) AS DOUBLE)
             / (CAST(s2 * s2 * s2 AS DOUBLE)
                / (6.0 * CAST(s1 * s1 * s1 AS DOUBLE))), 9) AS tri_ratio,
       ROUND(3.0 * (SELECT t FROM tr) / CAST(s2 // 2 AS DOUBLE), 9)
         AS global_cc,
       ROUND(CAST(s2 * s2 AS DOUBLE) / CAST(s1 * s1 * s1 AS DOUBLE), 9)
         AS expected_cc_cfg
FROM mm""",
        # stages.rfm.rfm_segments: exact NTILE(5) quintiles; monetary
        # rounded to cents BEFORE ranking on both sides
        "rfm_segments": """
WITH pc AS (
  SELECT o_custkey AS c_custkey,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS monetary,
         MAX(epoch_us(o_orderdate)) AS last_ts
  FROM orders GROUP BY 1),
mx AS (SELECT MAX(last_ts) AS m FROM pc),
base AS (SELECT c_custkey, frequency, monetary,
                CAST(((SELECT m FROM mx) - last_ts) // 86400000000
                     AS BIGINT) AS recency_days
         FROM pc)
SELECT c_custkey, recency_days, frequency, monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days, c_custkey)
            AS BIGINT) AS r_q,
       CAST(NTILE(5) OVER (ORDER BY frequency, c_custkey)
            AS BIGINT) AS f_q,
       CAST(NTILE(5) OVER (ORDER BY monetary, c_custkey)
            AS BIGINT) AS m_q
FROM base ORDER BY c_custkey""",
        # stages.vector_stats.hopkins_statistic: m=20 real probes by
        # smallest (splitmix64(vec_id), vec_id); synthetic coord (j,k)
        # from u = ((splitmix64(j·1000003+k) >> 11)+1)·2⁻⁵³ in the
        # per-dim [min,max] box; distances rounded to 9 before sums
        "hopkins": f"""
WITH ed AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   CAST(unnest(range(0, len(embedding))) AS BIGINT) AS k
            FROM embeddings),
bounds AS (SELECT k, MIN(x) AS lo, MAX(x) AS hi FROM ed GROUP BY 1),
probes AS (SELECT vec_id FROM
           (SELECT vec_id, {_splitmix_sql('vec_id', '0')} AS h
            FROM embeddings)
           ORDER BY h, vec_id LIMIT 20),
js AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS j),
sy AS (SELECT js.j, b.k,
              b.lo + ((CAST(({_splitmix_sql('js.j*1000003 + b.k', '0')}
                             >> 11) AS DOUBLE) + 1.0)
                      / 9007199254740992.0) * (b.hi - b.lo) AS val
       FROM js, bounds b),
ud AS (SELECT sy.j, ed.vec_id, SUM((sy.val - ed.x) ^ 2) AS d2
       FROM sy JOIN ed ON ed.k = sy.k GROUP BY 1, 2),
umin AS (SELECT j, ROUND(MIN(sqrt(d2)), 9) AS d FROM ud GROUP BY 1),
pd AS (SELECT p.vec_id AS pid, e2.vec_id,
              SUM((pe.x - e2.x) ^ 2) AS d2
       FROM probes p JOIN ed pe ON pe.vec_id = p.vec_id
       JOIN ed e2 ON e2.k = pe.k AND e2.vec_id <> p.vec_id
       GROUP BY 1, 2),
wmin AS (SELECT pid, ROUND(MIN(sqrt(d2)), 9) AS d FROM pd GROUP BY 1),
agg AS (SELECT (SELECT SUM(d) FROM umin) AS su,
               (SELECT SUM(d) FROM wmin) AS sw)
SELECT CAST(20 AS BIGINT) AS m, ROUND(su, 9) AS sum_u,
       ROUND(sw, 9) AS sum_w, ROUND(su / (su + sw), 9) AS hopkins
FROM agg""",
        # stages.vector_stats.hard_negatives: same probe draw and
        # explicit (x−p)² distance contract as `hopkins`
        "hard_negatives": f"""
WITH probes AS (SELECT vec_id FROM
                (SELECT vec_id, {_splitmix_sql('vec_id', '0')} AS h
                 FROM embeddings)
                ORDER BY h, vec_id LIMIT 10),
ed AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
              CAST(unnest(range(0, len(embedding))) AS BIGINT) AS k
       FROM embeddings),
pl AS (SELECT e.vec_id AS pid, e.label AS plab
       FROM embeddings e JOIN probes p ON p.vec_id = e.vec_id),
pd AS (SELECT p.vec_id AS pid, e2.vec_id AS nid,
              SUM((pe.x - e2.x) ^ 2) AS d2
       FROM probes p JOIN ed pe ON pe.vec_id = p.vec_id
       JOIN ed e2 ON e2.k = pe.k
       GROUP BY 1, 2),
flt AS (SELECT pd.pid, pl.plab, pd.nid, l2.label AS nlab,
               sqrt(pd.d2) AS d
        FROM pd JOIN pl ON pl.pid = pd.pid
        JOIN embeddings l2 ON l2.vec_id = pd.nid
        WHERE l2.label <> pl.plab AND pd.nid <> pd.pid),
rk AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY d, nid)
         AS rnk FROM flt)
SELECT pid AS probe_id, CAST(plab AS BIGINT) AS probe_label,
       CAST(rnk AS BIGINT) AS "rank", nid AS neighbor_id,
       CAST(nlab AS BIGINT) AS neighbor_label, ROUND(d, 9) AS dist
FROM rk WHERE rnk <= 5 ORDER BY probe_id, rnk""",
        # graph.degrees.degree_gini: exact Gini from the degree
        # histogram via integer group rank sums
        "degree_gini": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
h AS (SELECT degree AS v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
w AS (SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                 PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM h),
agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(v * c) AS BIGINT) AS sx,
               CAST(SUM(v * (c * cum + c * (c + 1) // 2)) AS BIGINT) AS sr
        FROM w)
SELECT n AS n_vertices,
       ROUND(CAST(sx AS DOUBLE) / n, 9) AS mean_degree,
       ROUND(2.0 * sr / (n * CAST(sx AS DOUBLE)) - (n + 1.0) / n, 9)
         AS gini
FROM agg""",
        # pipelines.tpch.q12: conditional agg over a big-big hash join
        "tpch_q12": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag""",
        # pipelines.tpch.q14: promo revenue share, broadcast dim lookup
        "tpch_q14": """
SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                    THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                                    ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'""",
        # moment sums over exact integer cents; std (ddof=1) from the
        # same sums with the engine's exact expression shape
        "event_type_stats": """
WITH c AS (SELECT event_type, value,
                  CAST(ROUND(value * 100) AS BIGINT) AS c100
           FROM events),
a AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c100) AS DOUBLE) AS s,
             MIN(value) AS min_value,
             MAX(value) AS max_value,
             CAST(SUM(c100 * c100) AS DOUBLE) AS s2
      FROM c GROUP BY event_type)
SELECT event_type, n,
       ROUND(s / 100.0, 6) AS sum_value,
       min_value, max_value,
       ROUND(s / (100.0 * n), 6) AS mean_value,
       ROUND(sqrt(greatest(s2 - s * s / n, 0.0) / (n - 1.0)) / 100.0, 6)
           AS std_value
FROM a""",

        # stages.cms: CMS cells = splitmix64(user_id ^ d*golden) % 128,
        # estimate = MIN over rows of the cell count
        "cms_user_counts": f"""
WITH dk(d, k) AS (VALUES (0, 0),
  (1, 11400714819323198485),
  (2, 4354685564936845354),
  (3, 15755400384260043839)),
h AS (SELECT e.user_id, dk.d,
             CAST({_splitmix_sql('xor(CAST(e.user_id AS UBIGINT), CAST(dk.k AS UBIGINT))', '0')} % 128 AS BIGINT) AS cell
      FROM events e CROSS JOIN dk),
cells AS (SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY d, cell),
uh AS (SELECT DISTINCT user_id, d, cell FROM h)
SELECT uh.user_id, CAST(MIN(cells.c) AS BIGINT) AS est_count
FROM uh JOIN cells ON cells.d = uh.d AND cells.cell = uh.cell
GROUP BY uh.user_id""",
        "normalize_text": """
SELECT doc_id,
       trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))
         AS norm_text,
       CAST(len(trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ',
                                    'g'))) AS BIGINT) AS n_chars
FROM documents""",
        "value_histogram": """
SELECT CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 19) AS BIGINT) AS bin,
       ROUND(LEAST(GREATEST(FLOOR(value / 10.0), 0), 19) * 10.0, 6) AS lo,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2""",
        "returnflag_corr": """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND((SUM(l_quantity * l_extendedprice)
              - SUM(l_quantity) * SUM(l_extendedprice) / COUNT(*))
             / SQRT((SUM(l_quantity * l_quantity)
                     - SUM(l_quantity) * SUM(l_quantity) / COUNT(*))
                    * (SUM(l_extendedprice * l_extendedprice)
                       - SUM(l_extendedprice) * SUM(l_extendedprice)
                         / COUNT(*))), 6) AS corr
FROM lineitem GROUP BY l_returnflag""",
        # stages.joins.anti_join: NOT EXISTS, broadcast strategy
        "cust_no_orders": """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment""",
        # text.pii.pii_scan over the same injected-PII stream as the
        # Ray query; identical regexes under RE2 and Python re
        "pii_scan": f"""
WITH p AS (
  SELECT doc_id,
    COALESCE(text, '')
    || CASE WHEN doc_id % 3 = 0
            THEN ' reach user' || doc_id || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
            ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{EMAIL_RE}', '[EMAIL]', 'g'),
      '{PHONE_RE}', '[PHONE]', 'g'),
      '{IPV4_RE}', '[IP]', 'g') AS clean_text
FROM p""",
        # text.chunking.chunk_documents: stride = 48, ceil(n/stride)
        # chunks, list_slice is 1-based inclusive
        "chunk_docs": """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(COALESCE(text, ''), '\\w+|[^\\w\\s]') AS tk
  FROM documents),
n AS (SELECT doc_id, tk, len(tk) AS nt FROM toks WHERE len(tk) > 0),
g AS (SELECT doc_id, tk, nt, UNNEST(generate_series(0, (nt + 47) // 48 - 1)) AS i
      FROM n)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 48 AS BIGINT) AS start_tok,
       CAST(LEAST(i * 48 + 64, nt) - i * 48 AS BIGINT) AS n_tokens,
       array_to_string(list_slice(tk, i * 48 + 1, LEAST(i * 48 + 64, nt)), ' ')
         AS chunk_text
FROM g""",
        # -- stages.joins.asof_join: latest order per (user, event time);
        # -- ties on o_orderdate -> min o_orderkey (the engine's tiebreak)
        "asof_orders": """
WITH ranked AS (
  SELECT e.event_id, e.user_id, CAST(epoch_us(e.ts) AS BIGINT) AS ts,
         o.o_orderkey AS asof_orderkey,
         ROUND(o.o_totalprice, 6) AS asof_totalprice,
         CAST(epoch_us(o.o_orderdate) AS BIGINT) AS asof_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey ASC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
SELECT event_id, user_id, ts, asof_orderkey, asof_totalprice, asof_orderdate
FROM ranked WHERE rn = 1""",
        # -- stages.joins.range_join: lineitems shipped within 30 days
        # -- of their order's date (inclusive interval)
        "range_join_ship": """
SELECT o.o_orderkey,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate,
       l.l_partkey, l.l_linenumber,
       CAST(epoch_us(l.l_shipdate) AS BIGINT) AS ship_ts
FROM orders o JOIN lineitem l
  ON o.o_orderkey = l.l_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY""",
        "embedding_neardup": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45""",
        # kmeans_embeddings / semdedup: unrolled deterministic Lloyd
        # iterations (see _kmeans_sql) + within-cluster cosine
        # components via recursive min-propagation.
        "kmeans_embeddings": f"""
WITH {_kmeans_sql(8, 4)}
SELECT vec_id, cid AS cluster FROM af""",
        "semdedup": f"""
WITH RECURSIVE {_kmeans_sql(8, 4)},
p AS (SELECT a.vec_id AS u, b.vec_id AS w FROM af a JOIN af b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.45),
sp AS (SELECT u, w FROM p UNION ALL SELECT w AS u, u AS w FROM p),
walk(v, comp) AS (
  SELECT vec_id, vec_id FROM af
  UNION
  SELECT sp.w, walk.comp FROM walk JOIN sp ON sp.u = walk.v),
comp AS (SELECT v, MIN(comp) AS rep FROM walk GROUP BY v)
SELECT af.vec_id, af.cid AS cluster, c.rep AS rep,
       af.vec_id = c.rep AS keep
FROM af JOIN comp c ON c.v = af.vec_id""",
        "simhash_pairs": _simhash_pairs_sql(),
        # clean_corpus: END-TO-END mirror of the composed hygiene
        # pipeline (pipelines.clean_corpus) — lang filter + quality
        # filter + exact-dedup (min doc_id per md5) + near-dedup
        # (connected components of the exact char-5-gram Jaccard
        # >= 0.7 graph, keep each component's min).  Composes the
        # individually-oracled lang_id / text_stats / exact_dedup /
        # minhash_dedup fragments.
        "clean_corpus": _CLEAN_SQL,
        "curate_corpus": _CURATE_SQL,
        # minhash_dedup: dup groups = connected components of the exact
        # char-5-gram Jaccard >= 0.7 pair graph (group id = min doc_id).
        # The Ray side reaches the same pair set via MinHash+LSH
        # candidates (16 bands x 4 rows: miss probability < 1e-7 at
        # J >= 0.9, the regime of the synthetic near-dups) + exact
        # verify; equality checked empirically at sf0.001/sf0.01.
        "minhash_dedup": r"""
WITH RECURSIVE s AS (
  SELECT doc_id,
    list_distinct([substr(x, i, 5) for i in range(1, greatest(length(x)-3, 2))]) AS gr
  FROM (SELECT doc_id,
        rpad(y, CAST(greatest(length(y), 5) AS INTEGER), ' ') AS x
        FROM (SELECT doc_id,
              regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g') AS y
              FROM documents)) ),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
        (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) >= 0.7),
sym AS (SELECT doc_a AS u, doc_b AS v FROM p
        UNION ALL SELECT doc_b, doc_a FROM p),
walk(v, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT sym.v, walk.comp FROM walk JOIN sym ON sym.u = walk.v),
comp AS (SELECT v, MIN(comp) AS comp FROM walk GROUP BY v)
SELECT d.doc_id,
       CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS dup_group
FROM documents d LEFT JOIN comp c ON c.v = d.doc_id""",
        # -- round-2 additions: recursive-SQL iterative engines + SQL
        # -- mirrors for lang_id / univar (previously rows-only)
        "pagerank_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
pr(it, v, score) AS (
  SELECT 0, v, 1.0/(SELECT n FROM nn) FROM d
  UNION ALL
  SELECT it+1, s.dst, 0.15/(SELECT n FROM nn) + 0.85*SUM(pr.score/d.degree)
  FROM pr JOIN s ON s.src = pr.v JOIN d ON d.v = pr.v
  WHERE it < 300 GROUP BY it+1, s.dst)
SELECT v, ROUND(score, 9) AS score FROM pr WHERE it = 300""",
        # anf_copurchase: HyperANF ball sketches after 8 rounds — 8
        # packed 6-bit HLL registers per vertex (splitmix64 of the
        # DENSE id; bucket = top 3 bits, rho = 61 - bitlen(low 61
        # bits) + 1, w=0 → 62), merged lane-wise MAX over
        # self ∪ neighbors each round.  Integer-deterministic, so the
        # packed BIGINT hashes exactly.
        "anf_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
h0 AS (SELECT v, {_splitmix_sql('dv', '0')} AS h FROM did),
ini AS (SELECT v,
        CAST(h >> 61 AS BIGINT) AS bucket,
        h & ((1::UBIGINT << 61) - 1) AS w FROM h0),
st(it, v, code) AS (
  SELECT 0, v,
         CAST(CASE WHEN w = 0 THEN 62
                   ELSE 61 - length(bin(w)) + 1 END AS BIGINT)
           << (6 * bucket)
  FROM ini
  UNION ALL
  SELECT st.it + 1, st.v, {_anf_merge}
  FROM st
  LEFT JOIN (
    SELECT s.src AS v, st2.it AS it, {_anf_aggs}
    FROM s JOIN st st2 ON st2.v = s.dst
    GROUP BY s.src, st2.it
  ) nb ON nb.v = st.v AND nb.it = st.it
  WHERE st.it < 8)
SELECT v, code AS regs FROM st WHERE it = 8""",

        # graph.iterative.neighborhood_function: same recursive st as
        # anf_copurchase, HLL estimate per (it, v) summed per round;
        # is_eff marks the smallest h with N(h) >= 0.9 N(8)
        "neighborhood_function": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
h0 AS (SELECT v, {_splitmix_sql('dv', '0')} AS h FROM did),
ini AS (SELECT v,
        CAST(h >> 61 AS BIGINT) AS bucket,
        h & ((1::UBIGINT << 61) - 1) AS w FROM h0),
st(it, v, code) AS (
  SELECT 0, v,
         CAST(CASE WHEN w = 0 THEN 62
                   ELSE 61 - length(bin(w)) + 1 END AS BIGINT)
           << (6 * bucket)
  FROM ini
  UNION ALL
  SELECT st.it + 1, st.v, {_anf_merge}
  FROM st
  LEFT JOIN (
    SELECT s.src AS v, st2.it AS it, {_anf_aggs}
    FROM s JOIN st st2 ON st2.v = s.dst
    GROUP BY s.src, st2.it
  ) nb ON nb.v = st.v AND nb.it = st.it
  WHERE st.it < 8),
lanes AS (SELECT it, v, k, (code >> (6 * k)) & 63 AS lane
          FROM st CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS k)),
perv AS (SELECT it, v,
                SUM(POWER(2.0, -CAST(lane AS DOUBLE))) AS denom,
                SUM(CASE WHEN lane = 0 THEN 1 ELSE 0 END) AS zeros
         FROM lanes GROUP BY it, v),
est AS (SELECT it, v,
               CASE WHEN (0.6355766053530124 * 64 / denom) <= 20.0 AND zeros > 0
                    THEN 8.0 * ln(8.0 / zeros)
                    ELSE 0.6355766053530124 * 64 / denom END AS e
        FROM perv),
nf AS (SELECT CAST(it AS BIGINT) AS h, ROUND(SUM(e), 4) AS nf FROM est GROUP BY it),
eff AS (SELECT MIN(h) AS eh FROM nf
        WHERE nf >= 0.9 * (SELECT nf FROM nf WHERE h = 8))
SELECT h, nf, CAST(CASE WHEN h = eff.eh THEN 1 ELSE 0 END AS BIGINT) AS is_eff
FROM nf CROSS JOIN eff""",
        # coloring_copurchase: Jones-Plassmann greedy coloring —
        # code < 0 = uncolored carrying -(priority+1) (static,
        # bijective splitmix of the dense id), code ≥ 0 = final color.
        # Per round the local priority maximum among uncolored
        # vertices takes the mex of its colored neighbors' colors
        # (candidates 0..deg(v) anti-joined against the neighbor color
        # set).  256 rounds ≥ the 223 the engine needs at sf0.01;
        # decided rows self-copy.
        "coloring_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
cand AS (SELECT d.v, unnest(generate_series(0, d.degree)) AS x FROM d),
st(it, v, code) AS (
  SELECT 0, did.v,
         -(CAST(({_splitmix_sql('did.dv', '0')} >> 1) AS BIGINT) + 1)
  FROM did
  UNION ALL
  SELECT st.it + 1, st.v,
    CASE WHEN st.code >= 0 THEN st.code
         WHEN st.code < COALESCE(nb.minneg, 0) THEN COALESCE(mx.mex, 0)
         ELSE st.code END
  FROM st
  LEFT JOIN (SELECT s.src AS v,
                    MIN(CASE WHEN st2.code < 0 THEN st2.code ELSE 0 END)
                      AS minneg
             FROM s JOIN st st2 ON st2.v = s.dst GROUP BY s.src) nb
    ON nb.v = st.v
  LEFT JOIN (SELECT c.v, MIN(c.x) AS mex
             FROM cand c
             LEFT JOIN (SELECT s.src AS v, st3.code AS col
                        FROM s JOIN st st3 ON st3.v = s.dst
                        WHERE st3.code >= 0) nc
               ON nc.v = c.v AND nc.col = c.x
             WHERE nc.v IS NULL GROUP BY c.v) mx
    ON mx.v = st.v
  WHERE st.it < 256)
SELECT v, code AS color FROM st WHERE it = 256""",
        # mis_copurchase: deterministic Luby MIS — codes -2 IN /
        # -1 OUT / priority (undecided); per round an undecided vertex
        # joins iff its priority (splitmix64(dense_v XOR r*C) >> 1, a
        # bijection of v within a round — no ties) beats every
        # undecided neighbor, drops out next to an IN neighbor, else
        # redraws.  64 rounds >> the O(log n) convergence; decided
        # rows self-copy.
        "mis_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
st(it, v, dv, code) AS (
  SELECT 0, v, dv,
         CAST(({_splitmix_sql('dv', '0')} >> 1) AS BIGINT) FROM did
  UNION ALL
  SELECT st.it + 1, st.v, st.dv,
    CASE WHEN st.code < 0 THEN st.code
         WHEN COALESCE(nb.has_in, FALSE) THEN -1
         WHEN st.code > COALESCE(nb.maxp, -1) THEN -2
         ELSE CAST(({_splitmix_sql('st.dv',
             f'(CAST(st.it + 1 AS HUGEINT) * {0xA24BAED4963EE407}) % {_M64}')}
             >> 1) AS BIGINT) END
  FROM st
  LEFT JOIN (
    SELECT s.src AS v, st2.it AS it,
           MAX(CASE WHEN st2.code >= 0 THEN st2.code END) AS maxp,
           BOOL_OR(st2.code = -2) AS has_in
    FROM s JOIN st st2 ON st2.v = s.dst
    GROUP BY s.src, st2.it
  ) nb ON nb.v = st.v AND nb.it = st.it
  WHERE st.it < 64)
SELECT v, code = -2 AS in_mis FROM st WHERE it = 64""",
        # monthly_graph: month-sliced edges (orders carry the month),
        # triangles per month via the correlated common-neighbor join
        # (per-edge counts sum to 3T).
        "monthly_graph": """
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
om AS (SELECT o_orderkey,
              CAST(date_part('year', o_orderdate) * 100
                   + date_part('month', o_orderdate) AS BIGINT) AS month
       FROM orders),
e AS (SELECT DISTINCT om.month, a.l_partkey AS src, b.l_partkey AS dst
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN om ON om.o_orderkey = a.l_orderkey),
s AS (SELECT month, src, dst FROM e
      UNION ALL SELECT month, dst, src FROM e),
tri AS (SELECT e.month, COUNT(s2.dst) AS t3
        FROM e JOIN s s1 ON s1.month = e.month AND s1.src = e.src
               JOIN s s2 ON s2.month = e.month AND s2.src = e.dst
                        AND s2.dst = s1.dst
        GROUP BY e.month),
nv AS (SELECT month, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_vertices
       FROM (SELECT month, src AS v FROM e
             UNION ALL SELECT month, dst FROM e) GROUP BY month),
ne AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_edges FROM e
       GROUP BY month)
SELECT nv.month, nv.n_vertices, ne.n_edges,
       CAST(COALESCE(tri.t3, 0) // 3 AS BIGINT) AS n_triangles
FROM nv JOIN ne ON ne.month = nv.month
LEFT JOIN tri ON tri.month = nv.month""",
        # msf_copurchase: see _msf_sql — unrolled Borůvka, unique
        # forest under the strict (w DESC, a, b) key.
        "msf_copurchase": _msf_sql(),
        # matching_copurchase: local-min-edge maximal matching — each
        # round every alive edge (both ends unmatched) draws
        # splitmix64((a<<32|b) XOR it*C) (bijective in the canonical
        # edge key within a round — no ties) and matches iff it
        # undercuts every alive edge sharing an endpoint; local minima
        # are pairwise non-adjacent so winners form a matching.  64
        # rounds >> the O(log m) convergence; decided rows self-copy.
        "matching_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
ed AS (SELECT a.dv AS a, b.dv AS b
       FROM e JOIN did a ON a.v = e.src JOIN did b ON b.v = e.dst),
st(it, dv, mate) AS (
  SELECT 0, dv, CAST(-1 AS BIGINT) FROM did
  UNION ALL
  SELECT st.it + 1, st.dv,
    CASE WHEN st.mate >= 0 THEN st.mate
         WHEN w.other IS NOT NULL THEN w.other
         ELSE CAST(-1 AS BIGINT) END
  FROM st
  LEFT JOIN (
    WITH ae AS (
      SELECT u.it AS it, ed.a AS a, ed.b AS b,
             {_splitmix_sql(
                 "CAST(ed.a AS UBIGINT) * 4294967296 + CAST(ed.b AS UBIGINT)",
                 f"(CAST(u.it AS HUGEINT) * {0xD1B54A32D192ED03}) % {_M64}")} AS q
      FROM ed
      JOIN st u  ON u.dv = ed.a AND u.mate < 0
      JOIN st v2 ON v2.dv = ed.b AND v2.it = u.it AND v2.mate < 0),
    vm AS (SELECT it, x AS dv, MIN(q) AS mq FROM (
             SELECT it, a AS x, q FROM ae
             UNION ALL SELECT it, b AS x, q FROM ae)
           GROUP BY it, x),
    wn AS (SELECT ae.it, ae.a, ae.b FROM ae
           JOIN vm va ON va.it = ae.it AND va.dv = ae.a
           JOIN vm vb ON vb.it = ae.it AND vb.dv = ae.b
           WHERE ae.q <= va.mq AND ae.q <= vb.mq)
    SELECT it, a AS dv, b AS other FROM wn
    UNION ALL SELECT it, b AS dv, a AS other FROM wn
  ) w ON w.dv = st.dv AND w.it = st.it
  WHERE st.it < 64)
SELECT did.v AS v, COALESCE(m2.v, -1) AS mate
FROM (SELECT dv, mate FROM st WHERE it = 64) f
JOIN did ON did.dv = f.dv
LEFT JOIN did m2 ON m2.dv = f.mate""",
        # fiedler_copurchase: 64 deflated power-iteration rounds on
        # (Δ+1)I - L from the ramp start — per round the working
        # state y is centered and unit-normalized IN the same
        # per-element expression the engine evaluates (subtract
        # window-mean, divide by sqrt(Σy² - n·μ²)), then
        # y' = (c - deg)·z + Σ_nbr z.
        "fiedler_copurchase": f"WITH RECURSIVE {_fiedler_chain()}\n"
                              "SELECT v, score FROM fs",
        # cheeger_cut: sweep cut over the Fiedler order — prefix
        # conductance minimum via the delta-array window sum.
        "cheeger_cut": f"""
WITH RECURSIVE {_fiedler_chain()},
rkv AS (SELECT fs.v, fs.score,
               CAST(row_number() OVER (ORDER BY fs.score, fs.v)
                    AS BIGINT) AS r
        FROM fs),
tot AS (SELECT CAST(SUM(degree) AS BIGINT) AS t FROM d),
vols AS (SELECT rkv.r, SUM(d.degree) OVER (ORDER BY rkv.r) AS vol
         FROM rkv JOIN d ON d.v = rkv.v),
epos AS (SELECT LEAST(ra.r, rb.r) AS lo, GREATEST(ra.r, rb.r) AS hi
         FROM e JOIN rkv ra ON ra.v = e.src JOIN rkv rb ON rb.v = e.dst),
dl AS (SELECT lo AS r, 1 AS dd FROM epos
       UNION ALL SELECT hi, -1 FROM epos),
dag AS (SELECT r, SUM(dd) AS sd FROM dl GROUP BY r),
cuts AS (SELECT rkv.r AS k,
                SUM(COALESCE(dag.sd, 0)) OVER (ORDER BY rkv.r) AS cut
         FROM rkv LEFT JOIN dag ON dag.r = rkv.r),
cond AS (SELECT cuts.k, CAST(cuts.cut AS BIGINT) AS cut_edges,
                CAST(LEAST(vols.vol, (SELECT t FROM tot) - vols.vol)
                     AS BIGINT) AS vol_small,
                CAST(cuts.cut AS DOUBLE)
                  / GREATEST(LEAST(vols.vol,
                                   (SELECT t FROM tot) - vols.vol), 1)
                  AS c
         FROM cuts JOIN vols ON vols.r = cuts.k
         WHERE cuts.k < (SELECT COUNT(*) FROM rkv))
SELECT k, cut_edges, vol_small, ROUND(c, 9) AS conductance
FROM cond ORDER BY c, k LIMIT 1""",
        # eigencen_copurchase: eigenvector centrality as 64 fixed
        # power-iteration rounds with per-round 2-norm normalization
        # (the window over the grouped step result), exactly the
        # engine's update x̂ ← A·x̂ / ‖A·x̂‖ from the uniform unit
        # vector.
        "eigencen_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
eig(it, v, score) AS (
  SELECT 0, v, 1.0/sqrt((SELECT n FROM nn)) FROM d
  UNION ALL
  SELECT it, v, raw / sqrt(SUM(raw*raw) OVER ()) FROM (
    SELECT eig.it+1 AS it, s.dst AS v, SUM(eig.score) AS raw
    FROM eig JOIN s ON s.src = eig.v
    WHERE eig.it < 64 GROUP BY eig.it+1, s.dst) t)
SELECT v, ROUND(score, 9) AS score FROM eig WHERE it = 64""",
        # katz_copurchase: Katz centrality as 32 fixed Jacobi rounds
        # x ← 1 + α·A·x from x_0 = 1, with α = 0.5/Δ derived from the
        # degree CTE exactly as the engine derives it from the CSR —
        # a contraction, so the fixed horizon is within 2^-32 of the
        # Neumann-series limit.  Every copurchase vertex has degree
        # ≥ 1, so the inner join covers the full vertex set.
        "katz_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
al AS (SELECT 0.5 / CAST(MAX(degree) AS DOUBLE) AS a FROM d),
kz(it, v, score) AS (
  SELECT 0, v, CAST(1.0 AS DOUBLE) FROM d
  UNION ALL
  SELECT it, v, 1.0 + (SELECT a FROM al) * raw FROM (
    SELECT kz.it+1 AS it, s.dst AS v, SUM(kz.score) AS raw
    FROM kz JOIN s ON s.src = kz.v
    WHERE kz.it < 32 GROUP BY kz.it+1, s.dst) t)
SELECT v, ROUND(score, 9) AS score FROM kz WHERE it = 32""",
        # hits_*: Kleinberg HITS on the bipartite user x event_type
        # incidence graph, collapsed to the T-dim gram matrix
        # M = B^T B (pgd_ray.graph.bipartite — the thin-side trick):
        # a_k = M a_{k-1} / ||.|| for 32 fixed rounds, hubs one pass
        # h = B a_32 / ||B a_32||.  M's positive diagonal keeps every
        # per-round norm > 0, so the unguarded division is safe.
        # markov_stationary: 64 fixed pi <- pi·P rounds over the
        # transition chain; P spelled pi·(c/out) exactly as the engine
        # precomputes it.  Assumes (holds on this corpus) every
        # observed type has outgoing AND incoming transitions — the
        # engine additionally handles dangling rows uniformly.
        "markov_stationary": """
WITH RECURSIVE s0 AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
tr AS (SELECT event_type AS tf, nxt AS tt, CAST(COUNT(*) AS DOUBLE) AS c
       FROM s0 WHERE nxt IS NOT NULL GROUP BY 1, 2),
ty AS (SELECT DISTINCT t FROM
       (SELECT tf AS t FROM tr UNION SELECT tt FROM tr)),
tn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM ty),
outs AS (SELECT tf, SUM(c) AS o FROM tr GROUP BY tf),
p(it, t, pi) AS (
  SELECT 0, t, 1.0 / (SELECT t FROM tn) FROM ty
  UNION ALL
  SELECT it, t, flow FROM (
    SELECT p.it+1 AS it, tr.tt AS t, SUM(p.pi * (tr.c / o.o)) AS flow
    FROM p JOIN tr ON tr.tf = p.t JOIN outs o ON o.tf = p.t
    WHERE p.it < 64 GROUP BY p.it+1, tr.tt) q)
SELECT t AS event_type, ROUND(pi, 9) AS pi FROM p WHERE it = 64""",
        # char_entropy: byte-distribution entropy per doc via the
        # algebraic form ln(len) - Σ c·ln(c)/len (ASCII corpus: chars
        # == bytes).
        "char_entropy": """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents),
cc AS (SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS n
       FROM ch GROUP BY doc_id, c),
agg AS (SELECT doc_id, SUM(n) AS len, SUM(n * ln(n)) AS s
        FROM cc GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(a.len, 0) AS BIGINT) AS n_chars,
       ROUND(COALESCE(ln(a.len) - a.s / a.len, 0.0), 6) + 0.0
         AS char_entropy
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""",
        # unigram_xent: order-0 sibling of bigram_lm — same tokenizer
        # mirror, H = -(1/|d|) Σ ln(c_w/N).
        "unigram_xent": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w FROM w0),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uc),
sc AS (SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
              SUM(ln(uc.c / (SELECT n FROM nu))) AS s
       FROM w JOIN uc USING (w) GROUP BY w.doc_id)
SELECT d.doc_id, CAST(COALESCE(sc.nw, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(-sc.s / sc.nw, 0.0), 6) + 0.0 AS cross_entropy
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""",
        # user_entropy: Shannon entropy of each user's type mix;
        # + 0.0 normalizes a single-type user's -0.0 on both sides.
        "user_entropy": """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
t AS (SELECT user_id, SUM(c) AS tot FROM c GROUP BY user_id)
SELECT c.user_id, CAST(t.tot AS BIGINT) AS n_events,
       ROUND(SUM(-(c.c / CAST(t.tot AS DOUBLE))
                 * ln(c.c / CAST(t.tot AS DOUBLE))), 6) + 0.0 AS entropy
FROM c JOIN t ON t.user_id = c.user_id
GROUP BY c.user_id, t.tot""",
        # chi2_type_dow: Pearson chi-square of type x day-of-week
        # (epoch day + 3 mod 7 => 0 = Monday); (o-e)·(o-e)/e with e
        # spelled the same way as the engine (r·c/n).
        "chi2_type_dow": """
WITH o AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
                  CAST(COUNT(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
n AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM o),
rt AS (SELECT event_type, CAST(SUM(o) AS DOUBLE) AS r FROM o GROUP BY 1),
ct AS (SELECT dow, CAST(SUM(o) AS DOUBLE) AS c FROM o GROUP BY 1),
ee AS (SELECT o.o, rt.r * ct.c / (SELECT n FROM n) AS e
       FROM o JOIN rt USING (event_type) JOIN ct USING (dow))
SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
       CAST(((SELECT COUNT(*) FROM rt) - 1)
            * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof
FROM ee""",
        # benford_prices: leading digit by floor(v / 10^floor(log10 v))
        # — floor on BOTH sides (DuckDB's double->int CAST rounds).
        "benford_prices": """
WITH d AS (SELECT CAST(floor(o_totalprice
                             / power(10.0, floor(log10(o_totalprice))))
                  AS BIGINT) AS digit
           FROM orders WHERE o_totalprice > 0),
o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM o)
SELECT digit, n, ROUND(n / (SELECT tot FROM t), 6) AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford
FROM o""",
        # json_props: JSON field extraction via DuckDB's ->> mirroring
        # the engine's vectorized extraction of props.k.
        "json_props": """
WITH k AS (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS k_mean
FROM k GROUP BY event_type""",
        # clustering_spectrum: c(k) over the same per-vertex triangle
        # CTE as local_cc; degree<2 vertices contribute 0.
        "clustering_spectrum": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}, {_VT_STREAM_CTE}
SELECT d.degree, CAST(COUNT(*) AS BIGINT) AS n_vertices,
       ROUND(AVG(CASE WHEN d.degree >= 2
                 THEN 2.0 * vt.tri / (d.degree * (d.degree - 1.0))
                 ELSE 0.0 END), 6) AS c_k
FROM d JOIN vt ON vt.v = d.v GROUP BY d.degree""",
        # ewma_daily: observed-day EWMA recurrence, seed = first day;
        # (1 - CAST(0.3 AS DOUBLE)) mirrors the engine's 1.0 - alpha.
        # type_runs: runs = change points + 1 via LAG in the same
        # (ts, event_id) per-user order the engine sorts by.
        "type_runs": """
WITH s0 AS (SELECT user_id, event_type,
                   LAG(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS prv
            FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prv IS NOT NULL AND prv <> event_type
                     THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs,
       ROUND(CAST(COUNT(*) AS DOUBLE) /
             (SUM(CASE WHEN prv IS NOT NULL AND prv <> event_type
                       THEN 1 ELSE 0 END) + 1), 6) AS avg_run_len
FROM s0 GROUP BY user_id""",
        # acf_daily: textbook ACF estimator over the observed-day
        # sequence (sequence index drives the lag, the ewma_daily
        # contract); full-series mean and denominator.
        "acf_daily": """
WITH dd AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
sq AS (SELECT row_number() OVER (ORDER BY day) AS rk, CAST(n AS DOUBLE) AS x
       FROM dd),
mu AS (SELECT AVG(x) AS m FROM sq),
den AS (SELECT SUM((x - (SELECT m FROM mu)) * (x - (SELECT m FROM mu))) AS d
        FROM sq),
lg AS (SELECT CAST(lag AS BIGINT) AS lag FROM
       (VALUES (1),(2),(3),(4),(5),(6),(7)) t(lag))
SELECT lg.lag,
       ROUND(SUM((a.x - (SELECT m FROM mu)) * (b.x - (SELECT m FROM mu)))
             / (SELECT d FROM den), 9) AS acf
FROM lg JOIN sq a ON 1 = 1 JOIN sq b ON b.rk = a.rk + lg.lag
GROUP BY lg.lag""",
        # stages.windows.cusum_daily: two-sided CUSUM (k=0.5, h=4.0)
        # over standardized daily counts; the recurrence is the
        # recursive CTE walking days in order
        "cusum_daily": """
WITH RECURSIVE dd AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
stat AS (SELECT AVG(CAST(n AS DOUBLE)) AS mu,
                stddev_pop(CAST(n AS DOUBLE)) AS sd FROM dd),
idx AS (SELECT day, n, row_number() OVER (ORDER BY day) AS i,
               CASE WHEN (SELECT sd FROM stat) > 0
                    THEN (CAST(n AS DOUBLE) - (SELECT mu FROM stat))
                         / (SELECT sd FROM stat)
                    ELSE 0.0 END AS z
        FROM dd),
cs(i, s_pos, s_neg) AS (
  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  UNION ALL
  SELECT idx.i,
         greatest(0.0, cs.s_pos + idx.z - 0.5),
         greatest(0.0, cs.s_neg - idx.z - 0.5)
  FROM cs JOIN idx ON idx.i = cs.i + 1)
SELECT idx.day, idx.n, ROUND(idx.z, 9) AS z,
       ROUND(cs.s_pos, 9) AS s_pos, ROUND(cs.s_neg, 9) AS s_neg,
       CAST(cs.s_pos > 4.0 OR cs.s_neg > 4.0 AS BIGINT) AS flagged
FROM cs JOIN idx ON idx.i = cs.i
ORDER BY idx.day""",
        # grouped_topk per day: trending event types
        "trending_daily": """
WITH dd AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
rk AS (SELECT day, event_type, n,
              row_number() OVER (PARTITION BY day
                                 ORDER BY n DESC, event_type) AS rnk
       FROM dd)
SELECT day, event_type, n, CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= 3 ORDER BY day, rnk""",
        # stages.windows.dow_seasonality: dow 0 = Monday
        "dow_seasonality": """
WITH dd AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
ov AS (SELECT AVG(CAST(n AS DOUBLE)) AS m FROM dd)
SELECT CAST((day + 4) % 7 AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(CAST(n AS DOUBLE)), 9) AS mean_count,
       ROUND(AVG(CAST(n AS DOUBLE)) / (SELECT m FROM ov), 9)
         AS seasonal_index
FROM dd GROUP BY 1 ORDER BY dow""",
        "ewma_daily": """
WITH RECURSIVE dd AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rk
      FROM dd),
w(event_type, day, n, rk, ewma) AS (
  SELECT event_type, day, n, rk, CAST(n AS DOUBLE) FROM r WHERE rk = 1
  UNION ALL
  SELECT r.event_type, r.day, r.n, r.rk,
         CAST(0.3 AS DOUBLE) * r.n + (1 - CAST(0.3 AS DOUBLE)) * w.ewma
  FROM w JOIN r ON r.event_type = w.event_type AND r.rk = w.rk + 1)
SELECT event_type, day, n, ROUND(ewma, 6) AS ewma FROM w""",
        # event_islands: classic gaps-and-islands — group key
        # event_id - row_number() per user.
        "event_islands": """
WITH g AS (SELECT user_id, event_id,
                  event_id - row_number() OVER (
                    PARTITION BY user_id ORDER BY event_id) AS grp
           FROM events),
isl AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS max_island
FROM isl GROUP BY user_id""",
        # grouped_ols: explicit five-sum OLS on x centered by the
        # exact integer min(ts) and scaled to days — mirrors
        # stages.regress.grouped_ols's formula (NOT regr_slope, whose
        # streaming kernel accumulates differently).
        "grouped_ols": """
WITH t0 AS (SELECT MIN(epoch_us(ts)) AS t FROM events),
b AS (SELECT event_type,
             CAST(epoch_us(ts) - (SELECT t FROM t0) AS DOUBLE)
               / 86400000000.0 AS x,
             value AS y
      FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
      FROM b GROUP BY event_type)
SELECT event_type, n,
       ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
       ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
         AS intercept
FROM s""",
        # fuzzy_names: vocabulary-level fuzzy match — DISTINCT names,
        # candidates = pairs sharing >= 1 whitespace token (the stated
        # recall contract), verified with levenshtein <= 2.
        "fuzzy_names": """
WITH nm AS (SELECT DISTINCT p_name FROM part),
tk AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM nm),
cand AS (SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
         FROM tk a JOIN tk b ON a.tok = b.tok AND a.p_name < b.p_name)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 2""",
        # bloom_semi_orders: the Bloom stage is a no-false-negative
        # prefilter + exact verify join, so the oracle is the PLAIN
        # semi-join — output equality holds for any FP rate.
        "bloom_semi_orders": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderpriority""",
        # value_quartiles: buckets against the exact rank-rule
        # thresholds (floor(q·(n-1)), lower value — the engine's
        # quantile contract); v == q_k lands in bucket k+... (strict <).
        "value_quartiles": """
WITH n AS (SELECT COUNT(*) AS c FROM events),
s AS (SELECT value AS x, row_number() OVER (ORDER BY value) - 1 AS r
      FROM events),
q AS (SELECT
  MAX(CASE WHEN r = CAST(floor(0.25*(c-1)) AS BIGINT) THEN x END) AS q1,
  MAX(CASE WHEN r = CAST(floor(0.5*(c-1)) AS BIGINT) THEN x END) AS q2,
  MAX(CASE WHEN r = CAST(floor(0.75*(c-1)) AS BIGINT) THEN x END) AS q3
  FROM s, n)
SELECT event_type,
       CAST(CASE WHEN value < q.q1 THEN 0 WHEN value < q.q2 THEN 1
                 WHEN value < q.q3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, q GROUP BY 1, 2""",
        # embedding_covariance: population cov(i,j) of embedding dims,
        # 1-based, upper triangle; the division chain mirrors
        # stages.vector_stats.embedding_covariance exactly.
        "embedding_covariance": """
WITH x AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
                  unnest(generate_series(1, len(embedding))) AS i
           FROM embeddings),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
mu AS (SELECT i, SUM(v) / (SELECT n FROM nn) AS m FROM x GROUP BY i),
xx AS (SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS sxy
       FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
       GROUP BY 1, 2)
SELECT xx.i, xx.j,
       ROUND(sxy / (SELECT n FROM nn) - ma.m * mb.m, 6) AS cov
FROM xx JOIN mu ma ON ma.i = xx.i JOIN mu mb ON mb.i = xx.j""",
        # source_overlap: identical string_split(' ') word semantics
        # as segment_dedup, sliding 5-shingles, distinct per source,
        # pair counts by equality join (the engine's bitmask popcount
        # computes the same distinct-pair cardinalities).
        "source_overlap": """
WITH w AS (SELECT source, string_split(trim(text), ' ') AS words
           FROM documents),
sh AS (SELECT DISTINCT source,
              array_to_string(words[t.i+1 : t.i+5], ' ') AS s
       FROM w, UNNEST(range(CAST(GREATEST(len(words) - 4, 0) AS BIGINT)))
              AS t(i)),
cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY source),
bt AS (SELECT a.source AS sa, b.source AS sb,
              CAST(COUNT(*) AS BIGINT) AS nb
       FROM sh a JOIN sh b ON b.s = a.s AND a.source < b.source
       GROUP BY 1, 2)
SELECT ca.source AS source_a, cb.source AS source_b,
       ca.c AS n_a, cb.c AS n_b, COALESCE(bt.nb, 0) AS n_both,
       ROUND(COALESCE(bt.nb, 0)
             / CAST(ca.c + cb.c - COALESCE(bt.nb, 0) AS DOUBLE), 6)
         AS jaccard
FROM cnt ca JOIN cnt cb ON ca.source < cb.source
LEFT JOIN bt ON bt.sa = ca.source AND bt.sb = cb.source""",
        # intrinsic_dim: TwoNN — two smallest euclidean distances per
        # vector (ties -> smaller vec_id), MLE n / Σ ln(r2/r1).
        "intrinsic_dim": """
WITH pd_ AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                    list_distance(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS d
             FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
rk AS (SELECT src, d,
              row_number() OVER (PARTITION BY src ORDER BY d, dst) AS rn
       FROM pd_),
tw AS (SELECT src, MAX(CASE WHEN rn = 1 THEN d END) AS r1,
              MAX(CASE WHEN rn = 2 THEN d END) AS r2
       FROM rk WHERE rn <= 2 GROUP BY src)
SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
       ROUND(COUNT(*) / SUM(ln(r2 / r1)), 6) AS id_mle
FROM tw WHERE r1 > 0""",
        # readability: the same three regex-run counts (RE2 and
        # re.ASCII agree on these byte classes), sentence count
        # clamped >= 1, the identical left-associated double formula.
        "readability": """
WITH c AS (SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
  GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS s,
  CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS y
FROM documents)
SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
       ROUND(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                     - 84.6 * (CAST(y AS DOUBLE) / GREATEST(w, 1)), 6)
         AS flesch
FROM c""",
        # centroid_confusion: per-label mean centroids (AVG per dim),
        # cosine rank with ties -> smaller centroid label (the
        # _TOPK_SQL convention), then confusion counts.
        "centroid_confusion": """
WITH x AS (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                  unnest(range(len(embedding))) AS i
           FROM embeddings),
ct AS (SELECT label AS cl, i, AVG(v) AS cv FROM x GROUP BY 1, 2),
sim AS (SELECT x.vec_id, ANY_VALUE(x.label) AS label_true, ct.cl,
               SUM(x.v * ct.cv)
                 / (sqrt(SUM(x.v * x.v)) * sqrt(SUM(ct.cv * ct.cv))) AS s
        FROM x JOIN ct ON ct.i = x.i GROUP BY x.vec_id, ct.cl),
pk AS (SELECT label_true, cl AS label_pred FROM (
         SELECT *, row_number() OVER (
                     PARTITION BY vec_id ORDER BY s DESC, cl) AS rn
         FROM sim) WHERE rn = 1)
SELECT CAST(label_true AS BIGINT) AS label_true,
       CAST(label_pred AS BIGINT) AS label_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pk GROUP BY 1, 2""",
        # jl_ratios: the identical Rademacher matrix from the
        # splitmix64 low bit of (i<<32 | j), projection sums per
        # output dim, norm ratio rounded 6.
        "jl_ratios": f"""
WITH x AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
                  unnest(range(len(embedding))) AS i
           FROM embeddings),
pp AS (SELECT unnest(range(16)) AS j),
sg AS (SELECT di.i, pp.j,
              CASE WHEN ({_splitmix_sql(
                  "CAST(di.i AS UBIGINT) * 4294967296 + CAST(pp.j AS UBIGINT)",
                  "0")}) % 2 = 1
                   THEN 1.0 ELSE -1.0 END / sqrt(16.0) AS s
       FROM (SELECT DISTINCT i FROM x) di CROSS JOIN pp),
y AS (SELECT x.vec_id, sg.j, SUM(x.v * sg.s) AS yj
      FROM x JOIN sg ON sg.i = x.i GROUP BY 1, 2),
ny AS (SELECT vec_id, SUM(yj * yj) AS ny FROM y GROUP BY 1),
nx AS (SELECT vec_id, SUM(v * v) AS nx FROM x GROUP BY 1)
SELECT ny.vec_id, ROUND(ny.ny / nx.nx, 6) AS norm_ratio
FROM ny JOIN nx ON nx.vec_id = ny.vec_id""",
        # knn_clusters: mutual-5-NN components — exact cosine ranks
        # (ties -> vec_id, the _TOPK_SQL convention), mutual = both
        # directions in each other's top-5, then the proven recursive
        # min-propagation walk over the (symmetric) mutual edges.
        "knn_clusters": """
WITH RECURSIVE sims AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
kn AS (SELECT src, dst FROM (
         SELECT src, dst,
                row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS rn
         FROM sims) WHERE rn <= 5),
mu AS (SELECT a.src, a.dst FROM kn a
       JOIN kn b ON b.src = a.dst AND b.dst = a.src),
wk(v, l) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT mu.dst, wk.l FROM wk JOIN mu ON mu.src = wk.v)
SELECT v AS vec_id, MIN(l) AS cluster FROM wk GROUP BY v""",
        # pca_embeddings: projection onto the top principal component
        # — the same unnest/gram covariance as embedding_covariance
        # (both triangles), then 64 fixed power-iteration rounds with
        # per-round 2-norm normalization from the uniform unit start
        # (the eigencen_copurchase recursion shape), then one centered
        # dot per vector.  Fixed horizon = the engine's contract; FP
        # association differences wash out under ROUND(6).
        "pca_embeddings": """
WITH RECURSIVE x AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
                  unnest(generate_series(1, len(embedding))) AS i
           FROM embeddings),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
mu AS (SELECT i, SUM(v) / (SELECT n FROM nn) AS m FROM x GROUP BY i),
xx AS (SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS sxy
       FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
       GROUP BY 1, 2),
cu AS (SELECT xx.i, xx.j, sxy / (SELECT n FROM nn) - ma.m * mb.m AS c
       FROM xx JOIN mu ma ON ma.i = xx.i JOIN mu mb ON mb.i = xx.j),
cv AS (SELECT i, j, c FROM cu UNION ALL SELECT j, i, c FROM cu WHERE i <> j),
dd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM mu),
pw(it, i, val) AS (
  SELECT 0, i, 1.0 / sqrt((SELECT d FROM dd)) FROM mu
  UNION ALL
  SELECT it, i, raw / sqrt(SUM(raw * raw) OVER ()) FROM (
    SELECT pw.it + 1 AS it, cv.i AS i, SUM(cv.c * pw.val) AS raw
    FROM pw JOIN cv ON cv.j = pw.i
    WHERE pw.it < 64 GROUP BY 1, 2) t),
vf AS (SELECT i, val FROM pw WHERE it = 64)
SELECT x.vec_id, ROUND(SUM((x.v - mu.m) * vf.val), 6) AS pc1
FROM x JOIN mu ON mu.i = x.i JOIN vf ON vf.i = x.i
GROUP BY x.vec_id""",
        # window_distinct_users: exact per-hour distinct users.
        "window_distinct_users": """
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1""",
        # conductance_tool: per-community conductance of the SAME
        # 20-round LP labeling — cut / min(vol, 2m - vol), each cut
        # edge charged to both endpoint communities; whole-volume
        # communities (denominator 0) report 0.
        "conductance_tool": f"""
WITH RECURSIVE {_TE_CTE}, {_S_CTE}, {_LP_CTE},
dg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS degree
       FROM s GROUP BY src),
cut AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM (
    SELECT la.label FROM e JOIN lab la ON la.v = e.src
                           JOIN lab lb ON lb.v = e.dst
    WHERE la.label <> lb.label
    UNION ALL
    SELECT lb.label FROM e JOIN lab la ON la.v = e.src
                           JOIN lab lb ON lb.v = e.dst
    WHERE la.label <> lb.label) GROUP BY label),
degs AS (SELECT la.label,
                CAST(SUM(COALESCE(dg.degree, 0)) AS BIGINT) AS volume
         FROM lab la LEFT JOIN dg ON dg.v = la.v GROUP BY la.label),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e)
SELECT degs.label, CAST(COALESCE(cut.cut, 0) AS BIGINT) AS cut_edges,
       degs.volume,
       ROUND(CASE WHEN least(degs.volume, 2*mm.m - degs.volume) > 0
                  THEN COALESCE(cut.cut, 0)
                       / CAST(least(degs.volume, 2*mm.m - degs.volume)
                              AS DOUBLE)
                  ELSE 0.0 END, 9) AS conductance
FROM degs LEFT JOIN cut ON cut.label = degs.label CROSS JOIN mm""",
        # conductance_cores: conductance of the k-core level partition
        # (same 64-round peel as kcore_copurchase, then the same
        # cut/volume splice as conductance_tool).
        "conductance_cores": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
k(it, v, val) AS (
  SELECT 0, v, degree FROM d
  UNION ALL
  SELECT it+1, src, CAST(MAX(LEAST(nval, rn)) AS BIGINT) FROM (
    SELECT k.it, s.src, k2.val AS nval,
           row_number() OVER (PARTITION BY s.src ORDER BY k2.val DESC) AS rn
    FROM k JOIN s ON s.src = k.v JOIN k k2 ON k2.v = s.dst AND k2.it = k.it
  ) WHERE it < 64 GROUP BY it+1, src),
lab AS (SELECT v, val AS label FROM k WHERE it = 64),
cut AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM (
    SELECT la.label FROM e JOIN lab la ON la.v = e.src
                           JOIN lab lb ON lb.v = e.dst
    WHERE la.label <> lb.label
    UNION ALL
    SELECT lb.label FROM e JOIN lab la ON la.v = e.src
                           JOIN lab lb ON lb.v = e.dst
    WHERE la.label <> lb.label) GROUP BY label),
degs AS (SELECT la.label, CAST(SUM(d.degree) AS BIGINT) AS volume
         FROM lab la JOIN d ON d.v = la.v GROUP BY la.label),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e)
SELECT degs.label AS core, CAST(COALESCE(cut.cut, 0) AS BIGINT) AS cut_edges,
       degs.volume,
       ROUND(CASE WHEN least(degs.volume, 2*mm.m - degs.volume) > 0
                  THEN COALESCE(cut.cut, 0)
                       / CAST(least(degs.volume, 2*mm.m - degs.volume)
                              AS DOUBLE)
                  ELSE 0.0 END, 9) AS conductance
FROM degs LEFT JOIN cut ON cut.label = degs.label CROSS JOIN mm""",
        # weighted_pagerank: 32 fixed rounds of
        # x ← (1-α)/n + α·Σ w·x/wdeg over basket-count edge weights —
        # the engine runs the SAME unweighted kernel on the w-fold
        # multigraph, so Σ w·x/wdeg is literally w repeated additions.
        "weighted_pagerank": """
WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ew AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
              CAST(COUNT(*) AS BIGINT) AS w
       FROM po a JOIN po b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
sw AS (SELECT src, dst, w FROM ew
       UNION ALL SELECT dst AS src, src AS dst, w FROM ew),
dw AS (SELECT src AS v, CAST(SUM(w) AS BIGINT) AS wdeg FROM sw GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dw),
pr(it, v, score) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM dw
  UNION ALL
  SELECT it, v, (1 - 0.85) / (SELECT n FROM nn) + 0.85 * raw FROM (
    SELECT pr.it+1 AS it, sw.dst AS v,
           SUM(pr.score * sw.w / dw.wdeg) AS raw
    FROM pr JOIN sw ON sw.src = pr.v JOIN dw ON dw.v = pr.v
    WHERE pr.it < 32 GROUP BY pr.it+1, sw.dst) t)
SELECT v, ROUND(score, 9) AS score FROM pr WHERE it = 32""",
        # silhouette_kmeans: simplified silhouette over the SAME
        # unrolled-Lloyd chain as kmeans_embeddings; list_distance is
        # the engine's sqrt-L2, (b-a)/greatest(a,b) per point, mean
        # per cluster.
        "silhouette_kmeans": f"""
WITH {_kmeans_sql(8, 4)},
dd AS (SELECT af.vec_id, af.cid, co.cid AS ocid,
              list_distance(af.v, co.v) AS dist
       FROM af CROSS JOIN c4 co),
ab AS (SELECT vec_id, cid,
              MIN(CASE WHEN ocid = cid THEN dist END) AS a,
              MIN(CASE WHEN ocid <> cid THEN dist END) AS b
       FROM dd GROUP BY vec_id, cid),
sil AS (SELECT cid, (b - a) / greatest(a, b) AS s FROM ab)
SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(s) / COUNT(*), 6) AS mean_silhouette
FROM sil GROUP BY cid""",
        # diameter_lb: double-sweep — BFS from MIN(v), farthest vertex
        # (dist DESC, v ASC), BFS again, MAX dist.
        "diameter_lb": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seed AS (SELECT MIN(v) AS sv FROM d),
w1(v, dist) AS (
  SELECT sv, 0 FROM seed
  UNION
  SELECT s.dst, w1.dist + 1 FROM w1 JOIN s ON s.src = w1.v
  WHERE w1.dist < 64),
d1 AS (SELECT v, MIN(dist) AS dist FROM w1 GROUP BY v),
far AS (SELECT v AS fv FROM d1 ORDER BY dist DESC, v LIMIT 1),
w2(v, dist) AS (
  SELECT fv, 0 FROM far
  UNION
  SELECT s.dst, w2.dist + 1 FROM w2 JOIN s ON s.src = w2.v
  WHERE w2.dist < 64),
d2 AS (SELECT v, MIN(dist) AS dist FROM w2 GROUP BY v)
SELECT CAST((SELECT sv FROM seed) AS BIGINT) AS start_v,
       CAST((SELECT fv FROM far) AS BIGINT) AS far_v,
       CAST(MAX(dist) AS BIGINT) AS diameter_lb
FROM d2""",
        # basket_lift: association lift of frequent part pairs —
        # n_both·N / (n_a·n_b), pairs with >= 3 shared baskets.
        "basket_lift": """
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM po),
ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM po GROUP BY 1),
pc AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
              CAST(COUNT(*) AS BIGINT) AS n_both
       FROM po a JOIN po b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2)
SELECT part_a, part_b, n_both,
       ROUND(n_both * (SELECT n FROM n) / CAST(i1.c * i2.c AS DOUBLE), 6)
         AS lift
FROM pc JOIN ic i1 ON i1.l_partkey = part_a
        JOIN ic i2 ON i2.l_partkey = part_b
WHERE n_both >= 3""",
        # comp_size_hist: component-size histogram of the support>=3
        # co-purchase graph — same recursive min-propagation walk as
        # cc_copurchase over the thresholded edge set.
        "comp_size_hist": """
WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pcn AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS c
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
e AS (SELECT src, dst FROM pcn WHERE c >= 3),
s AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
vtx AS (SELECT DISTINCT src AS v FROM s),
walk(v, comp) AS (
  SELECT v, v FROM vtx
  UNION
  SELECT s.dst, walk.comp FROM walk JOIN s ON s.src = walk.v),
cc AS (SELECT v, MIN(comp) AS comp FROM walk GROUP BY v),
cs AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS size FROM cc GROUP BY comp)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM cs GROUP BY size""",
        # pmi_collocations: Church-Hanks PMI of bigrams with count>=5;
        # the division chain mirrors text.lm.pmi_collocations exactly.
        "pmi_collocations": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS pos FROM w0),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uc),
bg AS (SELECT x.w AS w1, y.w AS w2
       FROM w x JOIN w y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
nb AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM bc)
SELECT bc.w1, bc.w2, bc.c AS n_pair,
       ROUND(ln((bc.c / (SELECT n FROM nb))
                / ((u1.c / (SELECT n FROM nu))
                   * (u2.c / (SELECT n FROM nu)))), 6) AS pmi
FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2
WHERE bc.c >= 5""",
        # decayed_counts: half-life-weighted counts at T = max(ts),
        # tau = 7 days in microseconds.
        "decayed_counts": """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS t FROM events)
SELECT event_type,
       ROUND(SUM(exp(-CAST((SELECT t FROM mx) - epoch_us(ts) AS DOUBLE)
                     / 604800000000.0)), 6) AS decayed_n
FROM events GROUP BY event_type""",
        # inter_event_gaps: per-type inter-arrival stats; the gap is
        # credited to the LATER event's type (LAG semantics).
        "inter_event_gaps": """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(gap), 6) AS mean_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY event_type""",
        # rollup_events: ROLLUP lattice with NULL-free sentinels
        # ('(all)', -1) mirroring stages.cube.rollup_counts.
        "rollup_events": """
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(day, -1) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 6) AS value_sum
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value
      FROM events)
GROUP BY ROLLUP (event_type, day)""",
        # pivot_user_types: conditional aggregation with the five
        # corpus types hardcoded (the engine derives them).
        "pivot_user_types": """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(COUNT(*) AS BIGINT) AS n_total
FROM events GROUP BY user_id""",
        # bpe_pairs: adjacent character pairs; documents are ASCII so
        # DuckDB's character substr equals the engine's byte pairs.
        "bpe_pairs": """
WITH ch AS (
  SELECT substr(d.text, CAST(i.i AS INTEGER), 2) AS pair
  FROM documents d,
       LATERAL unnest(generate_series(1, length(d.text) - 1)) AS i(i))
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM ch GROUP BY pair ORDER BY n DESC, pair LIMIT 32""",
        # avg_neighbor_degree: degree-degree correlation profile
        # knn(k) = mean over degree-k vertices of (mean neighbor
        # degree) — the Pastor-Satorras k_nn(k) curve; one gather
        # round over the CSR on the engine side.
        "avg_neighbor_degree": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
nd AS (SELECT s.src AS v, SUM(dd.degree) AS snd
       FROM s JOIN d dd ON dd.v = s.dst GROUP BY s.src)
SELECT d.degree,
       ROUND(AVG(CAST(nd.snd AS DOUBLE) / d.degree), 9) AS knn
FROM d JOIN nd ON nd.v = d.v GROUP BY d.degree""",
        "hits_authorities": f"""
WITH RECURSIVE {_BIP_CTE}
SELECT et AS event_type, ROUND(a, 9) AS authority FROM av WHERE it = 32""",
        "hits_hubs": f"""
WITH RECURSIVE {_BIP_CTE},
hr AS (SELECT p.user_id, SUM(av.a) AS raw
       FROM p JOIN av ON av.et = p.event_type AND av.it = 32
       GROUP BY p.user_id)
SELECT user_id, ROUND(raw / (SELECT sqrt(SUM(raw*raw)) FROM hr), 9) AS hub
FROM hr""",
        # butterflies_type: per-type 2x2-biclique participation — the
        # pair (ta < tb) with codegree c carries C(c,2) butterflies,
        # credited to both endpoint types.
        "butterflies_type": """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
m2 AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS c
       FROM p a JOIN p b
         ON a.user_id = b.user_id AND a.event_type < b.event_type
       GROUP BY 1, 2),
u AS (SELECT ta AS event_type, c*(c-1)//2 AS b FROM m2
      UNION ALL SELECT tb, c*(c-1)//2 FROM m2)
SELECT event_type, CAST(SUM(b) AS BIGINT) AS butterflies
FROM u GROUP BY event_type""",
        "kcore_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
k(it, v, val) AS (
  SELECT 0, v, degree FROM d
  UNION ALL
  SELECT it+1, src, CAST(MAX(LEAST(nval, rn)) AS BIGINT) FROM (
    SELECT k.it, s.src, k2.val AS nval,
           row_number() OVER (PARTITION BY s.src ORDER BY k2.val DESC) AS rn
    FROM k JOIN s ON s.src = k.v JOIN k k2 ON k2.v = s.dst AND k2.it = k.it
  ) WHERE it < 64 GROUP BY it+1, src)
SELECT v, val AS core FROM k WHERE it = 64""",
        # ktruss_copurchase: 5-truss by peeling — per level, recompute
        # each surviving edge's support (common neighbors within the
        # surviving symmetrized set; `tr` inside the recursive term is
        # the previous level's working table) and keep support >= 3.
        # Peeling converges in 3 rounds at sf0.01 / 0 at sf0.001; 8
        # levels is a comfortable cap (surviving rows just self-copy
        # after the fixpoint).
        "ktruss_copurchase": f"""
WITH RECURSIVE {_E_CTE},
tr(it, src, dst) AS (
  SELECT 0, src, dst FROM e
  UNION ALL
  SELECT t.it+1, t.src, t.dst
  FROM tr t
  JOIN (
    SELECT n1.a AS u, n2.a AS v, COUNT(*) AS c
    FROM (SELECT src AS a, dst AS b FROM tr UNION ALL SELECT dst, src FROM tr) n1
    JOIN (SELECT src AS a, dst AS b FROM tr UNION ALL SELECT dst, src FROM tr) n2
      ON n1.b = n2.b AND n1.a < n2.a
    GROUP BY n1.a, n2.a
  ) sup ON sup.u = t.src AND sup.v = t.dst AND sup.c >= 3
  WHERE t.it < 8)
SELECT src, dst FROM tr WHERE it = 8""",
        # wl_colors: 1-WL refinement with the engine's exact combine —
        # c' = splitmix((splitmix(c) + Σ_nb splitmix(c_nb)) mod 2^64),
        # colors carried as UBIGINT, sums in HUGEINT mod 2^64; output
        # shifted right once for int64 safety (the MIS convention)
        "wl_colors": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
wl(it, v, c) AS (
  SELECT 0, v, CAST(degree AS UBIGINT) FROM d
  UNION ALL
  SELECT it + 1, v, {_splitmix_sql('acc', '0')} FROM (
    SELECT w.it AS it, w.v AS v,
           CAST((CAST({_splitmix_sql('w.c', '0')} AS HUGEINT)
                 + SUM(CAST({_splitmix_sql('w2.c', '0')} AS HUGEINT)))
                % {_M64} AS UBIGINT) AS acc
    FROM wl w JOIN s ON s.src = w.v
    JOIN wl w2 ON w2.v = s.dst AND w2.it = w.it
    GROUP BY w.it, w.v, w.c
  ) WHERE it < 3)
SELECT v, CAST(c >> 1 AS BIGINT) AS color FROM wl WHERE it = 3""",
        # rich_club: edge density among vertices with degree > k
        "rich_club": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
ks AS (SELECT * FROM (VALUES (0), (50), (100), (150)) t(k)),
nk AS (SELECT ks.k, CAST(COUNT(d.v) AS BIGINT) AS n_k
       FROM ks LEFT JOIN d ON d.degree > ks.k GROUP BY ks.k),
ekt AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
        FROM ks JOIN e ON TRUE
        JOIN d d1 ON d1.v = e.src JOIN d d2 ON d2.v = e.dst
        WHERE least(d1.degree, d2.degree) > ks.k GROUP BY ks.k)
SELECT ks.k AS k, nk.n_k, COALESCE(ekt.e_k, 0) AS e_k,
       ROUND(CASE WHEN nk.n_k >= 2
             THEN 2.0 * COALESCE(ekt.e_k, 0) / (nk.n_k * (nk.n_k - 1))
             ELSE 0 END, 9) AS phi
FROM ks JOIN nk ON nk.k = ks.k LEFT JOIN ekt ON ekt.k = ks.k""",
        "s_metric": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE}
SELECT CAST(SUM(d1.degree * d2.degree) AS BIGINT) AS s_metric
FROM e JOIN d d1 ON d1.v = e.src JOIN d d2 ON d2.v = e.dst""",
        # two_hop_sizes: distinct vertices within distance <= 2,
        # excluding the vertex itself
        "two_hop_sizes": f"""
WITH {_E_CTE}, {_S_CTE},
two AS (
  SELECT s1.src AS v, s2.dst AS w FROM s s1 JOIN s s2 ON s2.src = s1.dst
  UNION
  SELECT src AS v, dst AS w FROM s)
SELECT v, CAST(COUNT(DISTINCT w) AS BIGINT) AS n2
FROM two WHERE w <> v GROUP BY v""",
        # onion_copurchase: layer-by-layer peel — round removes every
        # live vertex with within-S degree <= k (k starts at the min
        # degree and only rises to the survivors' min), layer = last
        # live round + 1, core = the k that removed the vertex.  The
        # window MIN over the filtered survivors carries the new k.
        "onion_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
peel(it, v, k) AS (
  SELECT 0, v, 0 FROM d
  UNION ALL
  SELECT it + 1, v, knew FROM (
    SELECT it, v, dg, GREATEST(k, MIN(dg) OVER ()) AS knew FROM (
      SELECT p.it AS it, p.v AS v, p.k AS k, COUNT(nb.v2) AS dg
      FROM peel p
      LEFT JOIN (SELECT s.src AS v1, p2.v AS v2, p2.it AS it
                 FROM s JOIN peel p2 ON p2.v = s.dst) nb
        ON nb.v1 = p.v AND nb.it = p.it
      GROUP BY p.it, p.v, p.k))
  WHERE dg > knew AND it < 512),
degs AS (
  SELECT p.it, p.v, p.k, COUNT(nb.v2) AS dg
  FROM peel p
  LEFT JOIN (SELECT s.src AS v1, p2.v AS v2, p2.it AS it
             FROM s JOIN peel p2 ON p2.v = s.dst) nb
    ON nb.v1 = p.v AND nb.it = p.it
  GROUP BY p.it, p.v, p.k),
kk AS (SELECT it, GREATEST(MAX(k), MIN(dg)) AS knext FROM degs GROUP BY it),
last AS (SELECT v, MAX(it) AS li FROM peel GROUP BY v)
SELECT last.v, CAST(last.li + 1 AS BIGINT) AS layer,
       CAST(kk.knext AS BIGINT) AS core
FROM last JOIN kk ON kk.it = last.li""",
        # densest_copurchase: Bahmani eps=0.5 peel — each round keeps
        # vertices with deg_S * |S| > 3 * m_S (written 2*dg*n_s >
        # 3*dsum with dsum = sum of within-S degrees = 2m, all exact
        # int64); best round by density DESC, earliest-round
        # tie-break — the engine compares the identical IEEE doubles.
        "densest_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
peel(it, v) AS (
  SELECT 0, v FROM d
  UNION ALL
  SELECT it + 1, v FROM (
    SELECT p.it AS it, p.v AS v,
           COUNT(nb.v2) AS dg,
           SUM(COUNT(nb.v2)) OVER (PARTITION BY p.it) AS dsum,
           COUNT(*) OVER (PARTITION BY p.it) AS n_s
    FROM peel p
    LEFT JOIN (SELECT s.src AS v1, p2.v AS v2, p2.it AS it
               FROM s JOIN peel p2 ON p2.v = s.dst) nb
      ON nb.v1 = p.v AND nb.it = p.it
    GROUP BY p.it, p.v
  ) WHERE 2 * dg * n_s > 3 * dsum AND it < 64
),
ns AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM peel GROUP BY it),
ms AS (SELECT p1.it AS it, CAST(COUNT(*) AS BIGINT) AS m
       FROM e JOIN peel p1 ON p1.v = e.src
              JOIN peel p2 ON p2.v = e.dst AND p2.it = p1.it
       GROUP BY p1.it)
SELECT ns.it AS best_round, ns.n AS n_sub, COALESCE(ms.m, 0) AS m_sub,
       ROUND(CAST(COALESCE(ms.m, 0) AS DOUBLE) / ns.n, 9) AS density,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ns) AS rounds
FROM ns LEFT JOIN ms ON ms.it = ns.it
ORDER BY CAST(COALESCE(ms.m, 0) AS DOUBLE) / ns.n DESC, ns.it ASC
LIMIT 1""",
        # link_pred_copurchase: top-100 non-adjacent distance-2 pairs
        # by common-neighbor count (deterministic (cn DESC, u, v)
        # ranking — the integer key makes the rank-100 cutoff exact),
        # with the Adamic-Adar score alongside.
        "link_pred_copurchase": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
p AS (
  SELECT s1.dst AS u, s2.dst AS v,
         CAST(COUNT(*) AS BIGINT) AS cn,
         SUM(1.0/ln(d.degree)) AS aa
  FROM s s1 JOIN s s2 ON s1.src = s2.src AND s1.dst < s2.dst
  JOIN d ON d.v = s1.src
  GROUP BY s1.dst, s2.dst),
np AS (SELECT p.u, p.v, p.cn, p.aa FROM p
       LEFT JOIN e ON e.src = p.u AND e.dst = p.v
       WHERE e.src IS NULL)
SELECT u, v, cn, ROUND(aa, 6) AS aa FROM np
ORDER BY cn DESC, u, v LIMIT 100""",
        # graph.linkpred full scores: ra distributed like aa; jac/pa
        # from endpoint degrees (jac = cn/(du+dv-cn), pa = du*dv)
        "link_pred_scores_copurchase": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
p AS (
  SELECT s1.dst AS u, s2.dst AS v,
         CAST(COUNT(*) AS BIGINT) AS cn,
         SUM(1.0/ln(d.degree)) AS aa,
         SUM(1.0/d.degree) AS ra
  FROM s s1 JOIN s s2 ON s1.src = s2.src AND s1.dst < s2.dst
  JOIN d ON d.v = s1.src
  GROUP BY s1.dst, s2.dst),
np AS (SELECT p.* FROM p
       LEFT JOIN e ON e.src = p.u AND e.dst = p.v
       WHERE e.src IS NULL)
SELECT np.u, np.v, np.cn, ROUND(np.aa, 6) AS aa, ROUND(np.ra, 6) AS ra,
       ROUND(CAST(np.cn AS DOUBLE) / (du.degree + dv.degree - np.cn), 6) AS jac,
       CAST(du.degree * dv.degree AS BIGINT) AS pa
FROM np JOIN d du ON du.v = np.u JOIN d dv ON dv.v = np.v
ORDER BY np.cn DESC, np.u, np.v LIMIT 50""",
        # bfs_copurchase: multi-level reachability walk capped at 64
        # hops (>> the co-purchase graph's diameter), min dist per
        # vertex; only reached vertices appear — mirroring the engine's
        # sentinel filter.  Seed = smallest raw part key.
        # random_walks_copurchase: 8-step deterministic walks from
        # every vertex — step t of walk w picks neighbor rank
        # splitmix64(dense(w) XOR t*C) mod deg(v).  The engine hashes
        # DENSE ids; dense relabel is monotone in raw id, so
        # row_number() over ordered raw vertices reconstructs it; the
        # per-(walk, step) hash table is precomputed once (16k rows)
        # so the recursive join stays cheap.
        "random_walks_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
did AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS dv FROM d),
adj AS (SELECT src, dst,
        CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk,
        COUNT(*) OVER (PARTITION BY src) AS dg FROM s),
hs AS (SELECT h.dv AS wid, r.t AS t,
       {_splitmix_sql('h.dv', f'(CAST(r.t AS HUGEINT) * {0xD1342543DE82EF95}) % {_M64}')} AS hh
       FROM did h CROSS JOIN range(1, 9) r(t)),
walk(wid, step, v) AS (
  SELECT dv, CAST(0 AS BIGINT), v FROM did
  UNION ALL
  SELECT w.wid, w.step + 1, a.dst
  FROM walk w
  JOIN hs ON hs.wid = w.wid AND hs.t = w.step + 1
  JOIN adj a ON a.src = w.v
   AND a.rnk = CAST(hs.hh % CAST(a.dg AS UBIGINT) AS BIGINT)
  WHERE w.step < 8)
SELECT d2.v AS walk_id, w.step, w.v
FROM walk w JOIN did d2 ON d2.dv = w.wid""",
        "bfs_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seed AS (SELECT MIN(v) AS sv FROM d),
walk(v, dist) AS (
  SELECT sv, 0 FROM seed
  UNION
  SELECT s.dst, walk.dist + 1
  FROM walk JOIN s ON s.src = walk.v
  WHERE walk.dist < 64)
SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY v""",
        # harmonic_copurchase: sampled harmonic centrality — one
        # seeded reachability walk per sampled source (4 smallest raw
        # part keys), min dist per (seed, vertex), then
        # (n-1)/k * SUM(1/dist) with the self term (dist 0) excluded
        # and unreached pairs contributing 0.  Round 6 absorbs
        # SUM-order float jitter (<= 4 terms per vertex).
        "harmonic_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seeds AS (SELECT v AS sv FROM d ORDER BY v LIMIT 4),
walk(sv, v, dist) AS (
  SELECT sv, sv, 0 FROM seeds
  UNION
  SELECT walk.sv, s.dst, walk.dist + 1
  FROM walk JOIN s ON s.src = walk.v
  WHERE walk.dist < 64),
md AS (SELECT sv, v, MIN(dist) AS dist FROM walk GROUP BY sv, v),
h AS (SELECT v, SUM(1.0/dist) AS hraw FROM md WHERE dist > 0 GROUP BY v),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM d)
SELECT d.v, ROUND(COALESCE(h.hraw, 0.0) * ((n.nn - 1) / 4.0), 6) AS harmonic
FROM d LEFT JOIN h ON h.v = d.v CROSS JOIN n""",
        "betweenness_copurchase": _betweenness_sql(),
        # closeness: same seeded walk as harmonic; r = reached seeds,
        # S = distance sum, c = (r/S)*(r/4)
        "closeness_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seeds AS (SELECT v AS sv FROM d ORDER BY v LIMIT 4),
walk(sv, v, dist) AS (
  SELECT sv, sv, 0 FROM seeds
  UNION
  SELECT walk.sv, s.dst, walk.dist + 1
  FROM walk JOIN s ON s.src = walk.v
  WHERE walk.dist < 64),
md AS (SELECT sv, v, MIN(dist) AS dist FROM walk GROUP BY sv, v),
agg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS r, SUM(CAST(dist AS DOUBLE)) AS sd
        FROM md WHERE dist > 0 GROUP BY v)
SELECT d.v,
       ROUND(COALESCE((agg.r / agg.sd) * (agg.r / 4.0), 0.0), 6) AS closeness
FROM d LEFT JOIN agg ON agg.v = d.v""",
        # ego_copurchase: edges induced on the seed's 2-hop ball
        # (seed = smallest raw part key); canonical (lo, hi) raw ids.
        "ego_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seed AS (SELECT MIN(v) AS sv FROM d),
walk(v, dist) AS (
  SELECT sv, 0 FROM seed
  UNION
  SELECT s.dst, walk.dist + 1
  FROM walk JOIN s ON s.src = walk.v
  WHERE walk.dist < 2),
mem AS (SELECT DISTINCT v FROM walk)
SELECT e.src, e.dst
FROM e JOIN mem a ON a.v = e.src JOIN mem b ON b.v = e.dst""",
        # ppr_copurchase: personalized PageRank, preference vector
        # e_seed (seed = smallest raw part key) — the pagerank mirror
        # with the teleport term moved onto the seed row.  No vertex in
        # d is dangling (degree >= 1 by construction).
        "ppr_copurchase": f"""
WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},
seed AS (SELECT MIN(v) AS sv FROM d),
pr(it, v, score) AS (
  -- CAST: a bare CASE literal types score DECIMAL(2,1), which
  -- silently truncates every score/degree division downstream
  SELECT 0, v, CAST(CASE WHEN v = (SELECT sv FROM seed) THEN 1.0 ELSE 0.0 END AS DOUBLE) FROM d
  UNION ALL
  SELECT it+1, s.dst,
         0.85*SUM(pr.score/d.degree) +
         CASE WHEN s.dst = (SELECT sv FROM seed) THEN 0.15 ELSE 0.0 END
  FROM pr JOIN s ON s.src = pr.v JOIN d ON d.v = pr.v
  WHERE it < 300 GROUP BY it+1, s.dst)
SELECT v, ROUND(score, 9) AS score FROM pr WHERE it = 300""",
        "label_prop_tool": f"""
WITH RECURSIVE {_TE_CTE}, {_S_CTE},
vtx AS (SELECT tid AS v FROM vocab),
lp(it, v, label) AS (
  SELECT 0, v, v FROM vtx
  UNION ALL
  SELECT it+1, v, new_label FROM (
    SELECT lp.it AS it, lp.v AS v, COALESCE(m.nl, lp.label) AS new_label
    FROM lp LEFT JOIN (
      SELECT s.src AS mv, lp2.label AS nl
      FROM s JOIN lp lp2 ON lp2.v = s.dst
      GROUP BY s.src, lp2.label
      QUALIFY row_number() OVER (PARTITION BY s.src
                                 ORDER BY COUNT(*) DESC, lp2.label ASC) = 1
    ) m ON m.mv = lp.v
  ) WHERE it < 20)
SELECT v AS tool_id, CAST(label AS BIGINT) AS label FROM lp WHERE it = 20""",
        # modularity_tool: per-community Newman modularity of the LP
        # labeling above — q_c = m_in/m - (deg_sum/(2m))^2, the exact
        # expression the engine evaluates (round 9 absorbs nothing:
        # both sides divide the same integers in the same order).
        "modularity_tool": f"""
WITH RECURSIVE {_TE_CTE}, {_S_CTE},
vtx AS (SELECT tid AS v FROM vocab),
lp(it, v, label) AS (
  SELECT 0, v, v FROM vtx
  UNION ALL
  SELECT it+1, v, new_label FROM (
    SELECT lp.it AS it, lp.v AS v, COALESCE(m.nl, lp.label) AS new_label
    FROM lp LEFT JOIN (
      SELECT s.src AS mv, lp2.label AS nl
      FROM s JOIN lp lp2 ON lp2.v = s.dst
      GROUP BY s.src, lp2.label
      QUALIFY row_number() OVER (PARTITION BY s.src
                                 ORDER BY COUNT(*) DESC, lp2.label ASC) = 1
    ) m ON m.mv = lp.v
  ) WHERE it < 20),
lab AS (SELECT v, CAST(label AS BIGINT) AS label FROM lp WHERE it = 20),
dg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS degree FROM s GROUP BY src),
intra AS (SELECT la.label, CAST(COUNT(*) AS BIGINT) AS m_in FROM e
          JOIN lab la ON la.v = e.src JOIN lab lb ON lb.v = e.dst
          WHERE la.label = lb.label GROUP BY la.label),
degs AS (SELECT la.label,
                CAST(SUM(COALESCE(dg.degree, 0)) AS BIGINT) AS deg_sum,
                CAST(COUNT(*) AS BIGINT) AS n_vertices
         FROM lab la LEFT JOIN dg ON dg.v = la.v GROUP BY la.label),
mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e)
SELECT degs.label, degs.n_vertices,
       CAST(COALESCE(intra.m_in, 0) AS BIGINT) AS m_in, degs.deg_sum,
       ROUND(COALESCE(intra.m_in, 0) / mm.m -
             (degs.deg_sum / (2 * mm.m)) * (degs.deg_sum / (2 * mm.m)), 9) AS q
FROM degs LEFT JOIN intra ON intra.label = degs.label CROSS JOIN mm""",
        "lang_id": """
WITH h AS (SELECT doc_id,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['das','den','der','die','ein','ist','mit','nicht','und','zu'], x))) AS de,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['a','and','for','in','is','it','of','that','the','to'], x))) AS en,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['el','es','la','las','los','por','que','un','una','y'], x))) AS es,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['des','est','et','la','le','les','pour','que','un','une'], x))) AS fr
FROM documents)
SELECT doc_id, CASE
  WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de = greatest(de, en, es, fr) THEN 'de'
  WHEN en = greatest(de, en, es, fr) THEN 'en'
  WHEN es = greatest(de, en, es, fr) THEN 'es'
  ELSE 'fr' END AS lang_pred
FROM h""",
        # ngram_jaccard: brute-force exact char-5-gram Jaccard over the
        # SAME normalization the shingle kernel applies (lowercase,
        # \s+ -> ' ', right-pad to 5); the Ray side reaches the same set
        # via LSH candidates + exact verify.
        "ngram_jaccard": r"""
WITH s AS (
  SELECT doc_id,
    list_distinct([substr(x, i, 5) for i in range(1, greatest(length(x)-3, 2))]) AS gr
  FROM (SELECT doc_id,
        -- NB: DuckDB rpad TRUNCATES to the target length; pad to
        -- max(length, 5) to mirror pyarrow utf8_rpad's min-width pad
        rpad(y, CAST(greatest(length(y), 5) AS INTEGER), ' ') AS x
        FROM (SELECT doc_id,
              regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g') AS y
              FROM documents)) )
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
             (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
      (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) >= 0.45""",
        # media_decode: the Ray side builds REAL payloads (doc_id % 3
        # cycles BMP / zlib PNG / baseline JPEG) whose dims are a pure
        # function of the text's utf-8 byte length, then decodes them
        # with the numpy codecs; the oracle re-derives the dims
        # arithmetically (round-trip check on all three real paths —
        # JPEG pixels are lossy, its SOF dims are exact).
        "media_decode": """
SELECT doc_id AS media_id,
       CAST(strlen(coalesce(text, '')) % 47 + 4 AS INTEGER) AS width,
       CAST((strlen(coalesce(text, '')) // 47) % 41 + 4 AS INTEGER) AS height
FROM documents""",
        "univar_clique4": f"""
WITH {_TE_CTE}, {_S_CTE},
pe AS (
  SELECT e.src, e.dst,
    (SELECT COUNT(*) FROM e wx
      WHERE EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.src AND s.dst = wx.dst)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.src)
        AND EXISTS (SELECT 1 FROM s WHERE s.src = e.dst AND s.dst = wx.dst)) AS clq
  FROM e),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(clq AS DOUBLE)) AS sv,
                SUM(CAST(clq AS DOUBLE)*CAST(clq AS DOUBLE)) AS svv,
                MIN(clq) AS mn, MAX(clq) AS mx FROM pe),
ord AS (SELECT clq AS v, row_number() OVER (ORDER BY clq) - 1 AS i FROM pe),
idx AS (SELECT n, n//2 AS med_idx, n//4 AS q_idx FROM base),
quant AS (SELECT
  (SELECT v FROM ord, idx WHERE i = med_idx) AS med_hi,
  (SELECT v FROM ord, idx WHERE i = med_idx - 1) AS med_lo,
  (SELECT v FROM ord, idx WHERE i = med_idx - q_idx) AS q1v,
  COALESCE((SELECT v FROM ord, idx WHERE i = med_idx + q_idx), 0) AS q3v)
SELECT CAST(base.n AS DOUBLE) AS n,
       ROUND(base.sv/base.n, 6) AS mean,
       ROUND(base.svv/base.n - (base.sv/base.n)*(base.sv/base.n), 6) AS variance,
       ROUND(sqrt(greatest(base.svv/base.n - (base.sv/base.n)*(base.sv/base.n), 0)), 6) AS std,
       CAST(base.mn AS DOUBLE) AS min, CAST(base.mx AS DOUBLE) AS max,
       ROUND(CASE WHEN base.n % 2 = 0 AND base.n >= 2
                  THEN (quant.med_lo + quant.med_hi)/2.0
                  ELSE quant.med_hi END, 6) AS median,
       CAST(quant.q1v AS DOUBLE) AS q1,
       CAST(quant.q3v AS DOUBLE) AS q3,
       CAST(quant.q3v - quant.q1v AS DOUBLE) AS iqr
FROM base, quant""",
        # set ops (stages/setops.py): the µs-integer midpoint split is
        # mirrored exactly ((hi-lo)//2 floor arithmetic)
        "users_retained": f"""
WITH {_EV_MID_CTE}, {_EV_PAIR_CTE}
SELECT DISTINCT user_id, k FROM pr, b WHERE tu < b.mid
INTERSECT
SELECT DISTINCT user_id, k FROM pr, b WHERE tu >= b.mid""",
        "users_churned": f"""
WITH {_EV_MID_CTE}, {_EV_PAIR_CTE}
SELECT DISTINCT user_id, k FROM pr, b WHERE tu < b.mid
EXCEPT
SELECT DISTINCT user_id, k FROM pr, b WHERE tu >= b.mid""",
        "users_any_half": f"""
WITH {_EV_MID_CTE}, {_EV_PAIR_CTE}
SELECT DISTINCT user_id, k FROM pr, b WHERE tu < b.mid
UNION
SELECT DISTINCT user_id, k FROM pr, b WHERE tu >= b.mid""",
        # media_resize: source pixel (r,c,ch) of the synthetic image is
        # ((r*w + c)*3 + ch + L) % 256 with (w,h) closed forms of
        # L = strlen(text); the engine's nearest-neighbor floor contract
        # src_row = (i*h)//8 is re-derived per output cell kk ∈ [0,192)
        "media_resize": """
WITH dims AS (
  SELECT doc_id, strlen(coalesce(text, '')) AS L,
         strlen(coalesce(text, '')) % 47 + 4 AS w,
         (strlen(coalesce(text, '')) // 47) % 41 + 4 AS h
  FROM documents),
cells AS (
  SELECT doc_id,
         ((((kk // 24) * h) // 8) * w * 3
          + (((kk % 24) // 3) * w) // 8 * 3
          + kk % 3 + L) % 256 AS val
  FROM dims CROSS JOIN (SELECT unnest(range(192)) AS kk) u)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(SUM(val) AS BIGINT) AS pix_sum
FROM cells GROUP BY doc_id""",
        # percentile_cont: DuckDB quantile_cont IS the ANSI linear-
        # interpolation definition the engine mirrors (round-6 contract)
        "percentile_cont_value": """
WITH v AS (SELECT quantile_cont(value,
             [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS arr FROM events)
SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
       ROUND(unnest(arr), 6) AS value
FROM v""",
        # dbscan: round-9 squared-distance threshold (eps² as the same
        # DOUBLE product the engine computes), self-inclusive counts,
        # min-label core components (knn_clusters recursion shape),
        # border = min core-neighbor label, noise -1
        "dbscan_embeddings": """
WITH RECURSIVE
d AS (SELECT a.vec_id AS i, b.vec_id AS j,
        ROUND((SELECT SUM((u.x - u.y) * (u.x - u.y))
               FROM (SELECT unnest(CAST(a.embedding AS DOUBLE[])) AS x,
                            unnest(CAST(b.embedding AS DOUBLE[])) AS y) u),
              9) AS d2
      FROM embeddings a, embeddings b),
nb AS (SELECT i, j FROM d
       WHERE d2 <= CAST(1.15 AS DOUBLE) * CAST(1.15 AS DOUBLE)),
core AS (SELECT i FROM nb GROUP BY i HAVING COUNT(*) >= 4),
cce AS (SELECT nb.i, nb.j FROM nb
        JOIN core ci ON ci.i = nb.i JOIN core cj ON cj.i = nb.j
        WHERE nb.i <> nb.j),
wk(v, l) AS (
  SELECT i, i FROM core
  UNION
  SELECT cce.j, wk.l FROM wk JOIN cce ON cce.i = wk.v),
comp AS (SELECT v, MIN(l) AS lab FROM wk GROUP BY v),
bord AS (SELECT nb.i AS v, MIN(comp.lab) AS lab
         FROM nb JOIN core cj ON cj.i = nb.j JOIN comp ON comp.v = nb.j
         WHERE nb.i <> nb.j AND nb.i NOT IN (SELECT i FROM core)
         GROUP BY nb.i)
SELECT e.vec_id,
       CAST(COALESCE(comp.lab, bord.lab, -1) AS BIGINT) AS label,
       CAST(CASE WHEN e.vec_id IN (SELECT i FROM core)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_core
FROM embeddings e
LEFT JOIN comp ON comp.v = e.vec_id
LEFT JOIN bord ON bord.v = e.vec_id""",
        # mixture_weights: same token regex as text_stats; τ=0.7
        # temperature rule, floats under the round-6 contract
        "mixture_weights": """
WITH t AS (
  SELECT source,
         SUM(length(regexp_extract_all(coalesce(text, ''),
                                       '\\w+|[^\\w\\s]'))) AS tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS tt FROM t),
pp AS (SELECT source, tokens, tokens / tt AS p FROM t, tot),
z AS (SELECT SUM(pow(p, 0.7)) AS z FROM pp)
SELECT source, CAST(tokens AS BIGINT) AS tokens, ROUND(p, 6) AS p,
       ROUND(pow(p, 0.7) / z, 6) AS w,
       ROUND(pow(p, 0.7) / z / p, 6) AS boost
FROM pp, z""",
        # stages.drift.psi_value: 10 equal-width bins over the GLOBAL
        # value range; event-time midpoint split (integer-µs mid, the
        # _event_halves contract); Laplace (c+1)/(N+nbins) smoothing;
        # psi = window sum of contribs.
        "psi_value": """
WITH st AS (SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid,
                   MIN(value) AS lo,
                   (MAX(value) - MIN(value)) / 10.0 AS w
            FROM events),
b AS (SELECT CASE WHEN (SELECT w FROM st) > 0
                  THEN LEAST(CAST(FLOOR((value - (SELECT lo FROM st))
                                        / (SELECT w FROM st)) AS BIGINT), 9)
                  ELSE 0 END AS bin,
             CASE WHEN epoch_us(ts) < (SELECT mid FROM st)
                  THEN 0 ELSE 1 END AS side
      FROM events WHERE value IS NOT NULL),
g AS (SELECT bin, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
      FROM b GROUP BY bin),
tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM g),
alln AS (SELECT CAST(gs.generate_series AS BIGINT) AS bin
         FROM generate_series(0, 9) gs),
p AS (SELECT alln.bin,
             CAST(COALESCE(g.c0, 0) AS BIGINT) AS n_first,
             CAST(COALESCE(g.c1, 0) AS BIGINT) AS n_second,
             (COALESCE(g.c0, 0) + 1.0) / ((SELECT n0 FROM tot) + 10.0) AS p1,
             (COALESCE(g.c1, 0) + 1.0) / ((SELECT n1 FROM tot) + 10.0) AS p2
      FROM alln LEFT JOIN g ON g.bin = alln.bin)
SELECT bin, n_first, n_second,
       ROUND(p1, 9) AS p_first, ROUND(p2, 9) AS p_second,
       ROUND((p1 - p2) * ln(p1 / p2), 9) AS contrib,
       ROUND(SUM((p1 - p2) * ln(p1 / p2)) OVER (), 9) AS psi
FROM p ORDER BY bin""",
        # stages.drift.ks_value: exact two-sample KS over distinct
        # values (complete tie groups); at_value = smallest value
        # achieving the max gap.
        "ks_value": """
WITH st AS (SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid
            FROM events),
b AS (SELECT value,
             CASE WHEN epoch_us(ts) < (SELECT mid FROM st)
                  THEN 1 ELSE 0 END AS a
      FROM events WHERE value IS NOT NULL),
g AS (SELECT value, SUM(a) AS c0, SUM(1 - a) AS c1 FROM b GROUP BY value),
t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1 FROM g),
c AS (SELECT value,
             SUM(c0) OVER (ORDER BY value) AS cum0,
             SUM(c1) OVER (ORDER BY value) AS cum1
      FROM g),
d AS (SELECT value,
             ABS(CAST(cum0 AS DOUBLE) / (SELECT n0 FROM t)
                 - CAST(cum1 AS DOUBLE) / (SELECT n1 FROM t)) AS diff
      FROM c)
SELECT ROUND(MAX(diff), 9) AS d_stat,
       MIN(CASE WHEN diff = (SELECT MAX(diff) FROM d) THEN value END)
         AS at_value,
       (SELECT n0 FROM t) AS n_first,
       (SELECT n1 FROM t) AS n_second
FROM d""",
        # stages.conv_stats.role_assortativity: Newman categorical r
        # from the directed consecutive-turn role mixing matrix;
        # trace/sum_ab as single divisions of integer sums.
        "role_assortativity": f"""
WITH {_T_CTE},
g AS (SELECT role AS a,
             LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM g WHERE b IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM c),
diag AS (SELECT CAST(COALESCE(SUM(CASE WHEN a = b THEN n END), 0) AS BIGINT)
           AS d FROM c),
rs AS (SELECT a AS k, SUM(n) AS r FROM c GROUP BY 1),
cs AS (SELECT b AS k, SUM(n) AS s FROM c GROUP BY 1),
ks AS (SELECT k FROM rs UNION SELECT k FROM cs),
sab AS (SELECT CAST(SUM(COALESCE(rs.r, 0) * COALESCE(cs.s, 0)) AS BIGINT)
          AS si
        FROM ks LEFT JOIN rs ON rs.k = ks.k LEFT JOIN cs ON cs.k = ks.k),
ex AS (SELECT CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS trace,
              CAST(si AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                AS sab2,
              n
       FROM diag, tot, sab)
SELECT n AS n_pairs, ROUND(trace, 9) AS trace_e, ROUND(sab2, 9) AS sum_ab,
       ROUND(CASE WHEN sab2 = 1.0 THEN 1.0
                  ELSE (trace - sab2) / (1.0 - sab2) END, 9) AS r
FROM ex""",
        # stages.conv_stats.transition_reciprocity: distinct-tool
        # transition mass matched by reverse transitions (weighted +
        # unordered-pair forms).
        "transition_reciprocity": f"""
WITH {_T_CTE},
g AS (SELECT tool AS a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM g WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2),
p AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi,
             SUM(CASE WHEN a < b THEN n ELSE 0 END) AS fwd,
             SUM(CASE WHEN a > b THEN n ELSE 0 END) AS bwd
      FROM c GROUP BY 1, 2),
s AS (SELECT CAST(COALESCE(SUM(fwd + bwd), 0) AS BIGINT) AS n_ordered,
             CAST(COALESCE(2 * SUM(least(fwd, bwd)), 0) AS BIGINT) AS n_recip,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COALESCE(SUM(CASE WHEN fwd > 0 AND bwd > 0
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_bidir
      FROM p)
SELECT n_ordered, n_recip,
       ROUND(CASE WHEN n_ordered > 0
                  THEN CAST(n_recip AS DOUBLE) / CAST(n_ordered AS DOUBLE)
                  ELSE 0.0 END, 9) AS recip_weighted,
       n_pairs, n_bidir AS n_pairs_bidir,
       ROUND(CASE WHEN n_pairs > 0
                  THEN CAST(n_bidir AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  ELSE 0.0 END, 9) AS recip_pairs
FROM s""",
        # stages.windows.holt_daily: Holt level+trend recurrence over
        # observed days (seed l=x₁, b=0; fitted = pre-update l+b);
        # DOUBLE casts pin the recurrence against DECIMAL inference.
        "holt_daily": """
WITH RECURSIVE dd AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
r AS (SELECT day, n, row_number() OVER (ORDER BY day) AS rk FROM dd),
w(day, n, rk, l, b, f) AS (
  SELECT day, n, rk, CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(n AS DOUBLE)
  FROM r WHERE rk = 1
  UNION ALL
  SELECT r.day, r.n, r.rk,
         CAST(0.5 AS DOUBLE) * r.n
           + (1 - CAST(0.5 AS DOUBLE)) * (w.l + w.b),
         CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * r.n
             + (1 - CAST(0.5 AS DOUBLE)) * (w.l + w.b)) - w.l)
           + (1 - CAST(0.3 AS DOUBLE)) * w.b,
         w.l + w.b
  FROM w JOIN r ON r.rk = w.rk + 1)
SELECT day, n, ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
       ROUND(f, 6) AS fitted
FROM w ORDER BY day""",
        # stages.fuzzy.entity_groups: CC (recursive min-label walk)
        # over the verified fuzzy-match pair graph; canonical = min
        # name per component, singletons map to themselves.
        "entity_groups": """
WITH RECURSIVE nm AS (SELECT DISTINCT p_name FROM part),
tk AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM nm),
cand AS (SELECT DISTINCT a.p_name AS na, b.p_name AS nb
         FROM tk a JOIN tk b ON a.tok = b.tok AND a.p_name < b.p_name),
pr AS (SELECT na, nb FROM cand WHERE levenshtein(na, nb) <= 2),
sym AS (SELECT na AS u, nb AS v FROM pr UNION ALL SELECT nb, na FROM pr),
walk(v, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT sym.v, walk.comp FROM walk JOIN sym ON sym.u = walk.v),
c AS (SELECT v, MIN(comp) AS comp FROM walk GROUP BY v)
SELECT nm.p_name, COALESCE(c.comp, nm.p_name) AS canonical
FROM nm LEFT JOIN c ON c.v = nm.p_name""",
        # stages.similarity.rrf_fusion: BM25 top-20 (the bm25_rank
        # chain verbatim) ⊕ cosine top-20 for probe vec 0; 1-based
        # ranks, absent rank pinned -1, rrf = Σ 1/(60+rk).
        "rrf_fusion": """
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
            FROM documents),
dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w0),
w AS (SELECT doc_id, unnest(ws) AS t FROM w0),
q AS (SELECT unnest(['table', 'sort', 'hash']) AS t),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(SUM(dl) AS DOUBLE) AS lsum FROM dl),
dfr AS (SELECT q.t, CAST(COUNT(DISTINCT w.doc_id) AS BIGINT) AS df
        FROM q LEFT JOIN w ON w.t = q.t GROUP BY q.t),
tf AS (SELECT w.doc_id, w.t, CAST(COUNT(*) AS BIGINT) AS tf
       FROM w JOIN q ON q.t = w.t GROUP BY w.doc_id, w.t),
sc AS (SELECT tf.doc_id,
              SUM(ln(1 + ((SELECT n FROM st) - dfr.df + 0.5) / (dfr.df + 0.5))
                  * tf.tf * (1.2 + 1)
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl /
                       ((SELECT lsum FROM st) / (SELECT n FROM st))))) AS s
       FROM tf JOIN dfr ON dfr.t = tf.t JOIN dl ON dl.doc_id = tf.doc_id
       GROUP BY tf.doc_id),
rbm0 AS (SELECT doc_id, row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id)
                AS rk
         FROM sc WHERE ROUND(s, 6) > 0),
rbm AS (SELECT doc_id AS id, CAST(rk AS BIGINT) AS rk FROM rbm0
        WHERE rk <= 20),
q0 AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
sims AS (SELECT e.vec_id,
                list_cosine_similarity(
                  CAST((SELECT embedding FROM q0) AS DOUBLE[]),
                  CAST(e.embedding AS DOUBLE[])) AS c
         FROM embeddings e),
rc0 AS (SELECT vec_id,
               CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS BIGINT)
                 AS rk
        FROM sims),
rcos AS (SELECT vec_id AS id, rk FROM rc0 WHERE rk <= 20),
u AS (SELECT COALESCE(rbm.id, rcos.id) AS id, rbm.rk AS r1, rcos.rk AS r2
      FROM rbm FULL OUTER JOIN rcos ON rcos.id = rbm.id),
f AS (SELECT id,
             COALESCE(1.0 / (60 + r1), 0.0)
               + COALESCE(1.0 / (60 + r2), 0.0) AS rrf,
             CAST(COALESCE(r1, -1) AS BIGINT) AS rk_bm25,
             CAST(COALESCE(r2, -1) AS BIGINT) AS rk_cosine
      FROM u),
top AS (SELECT id, ROUND(rrf, 9) AS rrf, rk_bm25, rk_cosine,
               row_number() OVER (ORDER BY rrf DESC, id) AS rn
        FROM f)
SELECT CAST(id AS BIGINT) AS id, rrf, rk_bm25, rk_cosine
FROM top WHERE rn <= 10""",
        "pq_codes": _pq_sql(4, 16, 3),
        # stages.conv_stats.tool_scc: SCC = mutual reachability over
        # the distinct-transition digraph; scc = MIN mutually
        # reachable tool (self-pairs make singletons well-defined).
        "tool_scc": f"""
WITH RECURSIVE {_T_CTE},
tv AS (SELECT DISTINCT tool FROM t),
g AS (SELECT tool AS a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c AS (SELECT DISTINCT a, b FROM g WHERE b IS NOT NULL AND a <> b),
walk(s, v) AS (
  SELECT tool, tool FROM tv
  UNION
  SELECT walk.s, c.b FROM walk JOIN c ON c.a = walk.v),
mut AS (SELECT w1.s AS a, w1.v AS b
        FROM walk w1 JOIN walk w2 ON w2.s = w1.v AND w2.v = w1.s)
SELECT a AS tool, MIN(b) AS scc FROM mut GROUP BY a""",
        # stages.retention.kaplan_meier: KM product-limit estimator
        # over integer lifetime days; event = last activity > 7 days
        # before corpus end; the product is the recursive CTE walking
        # durations in order (events before censoring at ties).
        "kaplan_meier": """
WITH RECURSIVE ue AS (SELECT user_id, MIN(epoch_us(ts)) AS t0,
                             MAX(epoch_us(ts)) AS t1
                      FROM events GROUP BY user_id),
ce AS (SELECT MAX(epoch_us(ts)) AS e FROM events),
du AS (SELECT (t1 - t0) // 86400000000 AS dur,
              CASE WHEN (SELECT e FROM ce) - t1 > 7 * 86400000000
                   THEN 1 ELSE 0 END AS ev
       FROM ue),
g AS (SELECT dur, SUM(ev) AS d, SUM(1 - ev) AS c FROM du GROUP BY dur),
r AS (SELECT dur, d, c, row_number() OVER (ORDER BY dur) AS rk FROM g),
tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM g),
atr AS (SELECT dur, d, c, rk,
               (SELECT n FROM tot)
                 - COALESCE(SUM(d + c) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
        FROM r),
km(rk, s) AS (
  SELECT 0, CAST(1.0 AS DOUBLE)
  UNION ALL
  SELECT atr.rk, km.s * (1 - CAST(atr.d AS DOUBLE) / atr.n_risk)
  FROM km JOIN atr ON atr.rk = km.rk + 1)
SELECT atr.dur AS dur_days, CAST(atr.n_risk AS BIGINT) AS n_risk,
       CAST(atr.d AS BIGINT) AS n_events, CAST(atr.c AS BIGINT) AS n_censored,
       ROUND(km.s, 9) AS survival
FROM km JOIN atr ON atr.rk = km.rk ORDER BY dur_days""",
        # stages.windows.ccf_daily: cross-correlation over the union
        # of observed days for the two types (missing side counts 0);
        # sequence index drives the lag, full-series means/denominator
        # (the acf_daily contract).
        "ccf_daily": """
WITH dd AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
            FROM events WHERE event_type IN ('view', 'purchase')
            GROUP BY 1),
sq AS (SELECT row_number() OVER (ORDER BY day) AS rk,
              CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
       FROM dd),
mu AS (SELECT AVG(x) AS mx, AVG(y) AS my FROM sq),
den AS (SELECT sqrt(SUM((x - (SELECT mx FROM mu)) * (x - (SELECT mx FROM mu)))
                    * SUM((y - (SELECT my FROM mu)) * (y - (SELECT my FROM mu))))
          AS d
        FROM sq),
lg AS (SELECT CAST(l AS BIGINT) AS lag FROM
       (VALUES (-7),(-6),(-5),(-4),(-3),(-2),(-1),(0),
               (1),(2),(3),(4),(5),(6),(7)) t(l))
SELECT lg.lag,
       ROUND(SUM((a.x - (SELECT mx FROM mu)) * (b.y - (SELECT my FROM mu)))
             / (SELECT d FROM den), 9) AS ccf
FROM lg JOIN sq a ON 1 = 1 JOIN sq b ON b.rk = a.rk + lg.lag
GROUP BY lg.lag ORDER BY lag""",
        # stages.cube.cube_counts: GROUP BY CUBE with the rollup
        # sentinels; dow 0 = Monday.
        "cube_events": """
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(dow, -1) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 6) AS value_sum
FROM (SELECT event_type,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
             value
      FROM events)
GROUP BY CUBE (event_type, dow)""",
        # stages.windows.window_functions2: percent_rank + FULL-FRAME
        # first/last value (explicit UNBOUNDED frame).
        "window_functions2": """
SELECT user_id, event_id, value,
       CAST(row_number() OVER w AS BIGINT) AS row_number,
       ROUND(CASE WHEN COUNT(*) OVER p > 1
                  THEN CAST(row_number() OVER w - 1 AS DOUBLE)
                       / (COUNT(*) OVER p - 1)
                  ELSE 0.0 END, 9) AS percent_rank,
       first_value(value) OVER wf AS first_value,
       last_value(value) OVER wf AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
       p AS (PARTITION BY user_id),
       wf AS (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
        # graph.linkpred.simrank: unrolled 5-round pairwise recursion
        # over the tool graph; isolated endpoints pin 0.
        "simrank_tool": f"WITH {_TE_CTE}, {_simrank_sql(5)} "
                        "SELECT tool_a, tool_b, simrank FROM fin",
        # graph.iterative.sssp_distances: Bellman-Ford over the
        # basket-weight graph; self-edges w=0 keep the INF sentinel
        # exact, unreachable pins -1.
        "sssp_copurchase": """
WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ew AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
              CAST(COUNT(*) AS BIGINT) AS w
       FROM po a JOIN po b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
sw AS (SELECT src, dst, w FROM ew
       UNION ALL SELECT dst AS src, src AS dst, w FROM ew),
dw AS (SELECT src AS v FROM sw GROUP BY src),
seed AS (SELECT MIN(v) AS sv FROM dw),
swz AS (SELECT src, dst, w FROM sw
        UNION ALL SELECT v, v, CAST(0 AS BIGINT) FROM dw),
bf(it, v, d) AS (
  SELECT 0, v, CASE WHEN v = (SELECT sv FROM seed)
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(1152921504606846976 AS BIGINT) END
  FROM dw
  UNION ALL
  SELECT bf.it + 1, swz.dst, MIN(bf.d + swz.w)
  FROM bf JOIN swz ON swz.src = bf.v
  WHERE bf.it < 30 GROUP BY bf.it + 1, swz.dst)
SELECT v, CASE WHEN d >= 1152921504606846976
               THEN CAST(-1 AS BIGINT) ELSE d END AS dist
FROM bf WHERE it = 30""",
        # stages.clustering.cluster_validity: CH + DB indices of the
        # given labels (centroids by AVG per (label, dim)).
        "cluster_validity": """
WITH x AS (SELECT vec_id, label,
                  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS v,
                  unnest(range(len(embedding))) AS dim
           FROM embeddings),
cen AS (SELECT label, dim, SUM(v) / COUNT(*) AS c,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM x GROUP BY label, dim),
g AS (SELECT dim, SUM(v) / (SELECT COUNT(*) FROM embeddings) AS gc
      FROM x GROUP BY dim),
pt AS (SELECT x.vec_id, x.label,
              SUM((x.v - cen.c) * (x.v - cen.c)) AS sq
       FROM x JOIN cen ON cen.label = x.label AND cen.dim = x.dim
       GROUP BY x.vec_id, x.label),
wl AS (SELECT label, SUM(sq) AS d2, SUM(sqrt(sq)) AS d1,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM pt GROUP BY label),
cl AS (SELECT label, MAX(cnt) AS cnt FROM cen GROUP BY label),
bt AS (SELECT SUM(cl.cnt * t.d2g) AS b
       FROM cl JOIN (SELECT cen.label,
                            SUM((cen.c - g.gc) * (cen.c - g.gc)) AS d2g
                     FROM cen JOIN g ON g.dim = cen.dim
                     GROUP BY cen.label) t ON t.label = cl.label),
wt AS (SELECT SUM(d2) AS w FROM wl),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cl),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
sl AS (SELECT label, d1 / cnt AS s FROM wl),
cdist AS (SELECT a.label AS i, b.label AS j,
                 sqrt(SUM((a.c - b.c) * (a.c - b.c))) AS dij
          FROM cen a JOIN cen b ON a.dim = b.dim AND a.label <> b.label
          GROUP BY a.label, b.label),
rr AS (SELECT cdist.i, MAX((si.s + sj.s) / cdist.dij) AS r
       FROM cdist JOIN sl si ON si.label = cdist.i
       JOIN sl sj ON sj.label = cdist.j
       GROUP BY cdist.i)
SELECT (SELECT k FROM kk) AS k, (SELECT n FROM nn) AS n,
       ROUND(((SELECT b FROM bt) / ((SELECT k FROM kk) - 1))
             / ((SELECT w FROM wt)
                / ((SELECT n FROM nn) - (SELECT k FROM kk))), 6)
         AS ch_index,
       ROUND((SELECT AVG(r) FROM rr), 6) AS db_index""",
        # stages.basket.type_user_jaccard: distinct-user audience
        # overlap; only intersecting pairs appear.
        "type_user_jaccard": """
WITH p AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS na
       FROM p GROUP BY 1),
it AS (SELECT a.event_type AS ta, b.event_type AS tb,
              CAST(COUNT(*) AS BIGINT) AS inter
       FROM p a JOIN p b
         ON a.user_id = b.user_id AND a.event_type < b.event_type
       GROUP BY 1, 2)
SELECT ta AS type_a, tb AS type_b, inter AS n_both,
       sa.na AS n_a, sb.na AS n_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.na + sb.na - inter), 9)
         AS jaccard
FROM it JOIN sz sa ON sa.event_type = it.ta
JOIN sz sb ON sb.event_type = it.tb""",
        # graph.percolation.percolation_profile: content-hash bond
        # percolation (engine hash mirrored by _edgemix_sql).
        "percolation": f"WITH RECURSIVE {_E_CTE},\n"
                       + _percolation_sql((0.2, 0.4, 0.6, 0.8), 42),
        # text.analysis.lang_confusion: declared lang × the lang_id
        # CASE chain (same CTE as the lang_id oracle).
        "lang_confusion": """
WITH h AS (SELECT doc_id,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['das','den','der','die','ein','ist','mit','nicht','und','zu'], x))) AS de,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['a','and','for','in','is','it','of','that','the','to'], x))) AS en,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['el','es','la','las','los','por','que','un','una','y'], x))) AS es,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> list_contains(['des','est','et','la','le','les','pour','que','un','une'], x))) AS fr
FROM documents),
p AS (SELECT doc_id, CASE
  WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de = greatest(de, en, es, fr) THEN 'de'
  WHEN en = greatest(de, en, es, fr) THEN 'en'
  WHEN es = greatest(de, en, es, fr) THEN 'es'
  ELSE 'fr' END AS lang_pred
FROM h)
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN p ON p.doc_id = d.doc_id
GROUP BY 1, 2 ORDER BY 1, 2""",
        # stages.conv_stats.tool_pagerank: directed PR with
        # dangling-self-loop contract; zero rows keep every target
        # present in the aggregated recursion.
        "tool_pagerank": f"""
WITH RECURSIVE {_T_CTE},
tv AS (SELECT DISTINCT tool FROM t),
g AS (SELECT tool AS a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c0 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
       FROM g WHERE b IS NOT NULL GROUP BY 1, 2),
cz AS (SELECT a, b, n FROM c0
       UNION ALL SELECT tool, tool, 1 FROM tv
       WHERE tool NOT IN (SELECT DISTINCT a FROM c0)
       UNION ALL SELECT tool, tool, 0 FROM tv),
ow AS (SELECT a, CAST(SUM(n) AS BIGINT) AS w FROM cz GROUP BY a),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tv),
pr(it, v, s) AS (
  SELECT 0, tool, 1.0 / (SELECT n FROM nn) FROM tv
  UNION ALL
  SELECT pr.it + 1, cz.b,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * SUM(pr.s * cz.n / ow.w)
  FROM pr JOIN cz ON cz.a = pr.v JOIN ow ON ow.a = pr.v
  WHERE pr.it < 32 GROUP BY pr.it + 1, cz.b)
SELECT v AS tool, ROUND(s, 9) AS score FROM pr WHERE it = 32
ORDER BY tool""",
        # stages.windows.user_burstiness: Barabási B over second-scale
        # gaps; population σ with the clamp both engines apply.
        "user_burstiness": """
WITH s0 AS (SELECT user_id, epoch_us(ts) AS tu, event_id FROM events),
g AS (SELECT user_id,
             tu - LAG(tu) OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS gus
      FROM s0),
a AS (SELECT user_id, CAST(COUNT(gus) AS BIGINT) AS n,
             CAST(SUM(gus) AS DOUBLE) AS s1us,
             SUM((CAST(gus AS DOUBLE) / 1000000.0)
                 * (CAST(gus AS DOUBLE) / 1000000.0)) AS s2
      FROM g WHERE gus IS NOT NULL GROUP BY user_id),
b AS (SELECT user_id, n, s1us / n / 1000000.0 AS mu, s2 FROM a
      WHERE n >= 2)
SELECT user_id, n AS n_gaps,
       ROUND(mu, 6) AS mean_gap_s,
       ROUND((sqrt(greatest(s2 / n - mu * mu, 0.0)) - mu)
             / (sqrt(greatest(s2 / n - mu * mu, 0.0)) + mu),
             6) AS burstiness
FROM b ORDER BY user_id""",
        # text.analysis.hapax_stats: vocab frequency histogram fold
        # (same token contract as vocab_topk).
        "hapax_stats": """
WITH w AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS tok
           FROM documents),
t AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY tok),
h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS v FROM t GROUP BY c)
SELECT CAST(SUM(v) AS BIGINT) AS vocab_size,
       CAST(SUM(c * v) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(CASE WHEN c = 1 THEN v END), 0) AS BIGINT)
         AS n_hapax,
       CAST(COALESCE(SUM(CASE WHEN c = 2 THEN v END), 0) AS BIGINT)
         AS n_dis,
       ROUND(CAST(COALESCE(SUM(CASE WHEN c = 1 THEN v END), 0) AS DOUBLE)
             / SUM(v), 9) AS hapax_frac,
       ROUND(CAST(COALESCE(SUM(CASE WHEN c = 2 THEN v END), 0) AS DOUBLE)
             / SUM(v), 9) AS dis_frac
FROM h""",
        # graph.percolation.attack_profile: hub-removal robustness.
        "attack": f"WITH RECURSIVE {_E_CTE}, {_S_CTE}, {_D_CTE},\n"
                  + _attack_sql((0.01, 0.05, 0.1, 0.2)),
        # stages.conv_stats.transition_entropy: per-source next-tool
        # entropy + the (w_a/N)-weighted entropy rate.
        "transition_entropy": f"""
WITH {_T_CTE},
g AS (SELECT tool AS a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM g WHERE b IS NOT NULL GROUP BY 1, 2),
w AS (SELECT a, CAST(SUM(n) AS BIGINT) AS w FROM c GROUP BY a),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM c),
h AS (SELECT c.a, -SUM((CAST(c.n AS DOUBLE) / w.w)
                       * ln(CAST(c.n AS DOUBLE) / w.w)) AS ent
      FROM c JOIN w ON w.a = c.a GROUP BY c.a),
rt AS (SELECT SUM((CAST(w.w AS DOUBLE) / (SELECT n FROM tot)) * h.ent)
         AS rate
       FROM w JOIN h ON h.a = w.a)
SELECT h.a AS tool, w.w AS n_out, ROUND(h.ent, 9) AS entropy,
       ROUND((SELECT rate FROM rt), 9) AS entropy_rate
FROM h JOIN w ON w.a = h.a ORDER BY tool""",
        # stages.drift.w1_value: ∫|F1−F2|dx over distinct values; the
        # last row's LEAD is NULL and drops from SUM (the engine's
        # zero term).
        "w1_value": """
WITH st AS (SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid
            FROM events),
b AS (SELECT value,
             CASE WHEN epoch_us(ts) < (SELECT mid FROM st)
                  THEN 1 ELSE 0 END AS a
      FROM events WHERE value IS NOT NULL),
g AS (SELECT value, SUM(a) AS c0, SUM(1 - a) AS c1 FROM b GROUP BY value),
t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1 FROM g),
c AS (SELECT value,
             SUM(c0) OVER (ORDER BY value) AS cum0,
             SUM(c1) OVER (ORDER BY value) AS cum1
      FROM g),
d AS (SELECT value,
             ABS(CAST(cum0 AS DOUBLE) / (SELECT n0 FROM t)
                 - CAST(cum1 AS DOUBLE) / (SELECT n1 FROM t)) AS diff,
             LEAD(value) OVER (ORDER BY value) AS nv
      FROM c)
SELECT ROUND(SUM(diff * (nv - value)), 9) AS w1,
       (SELECT n0 FROM t) AS n_first,
       (SELECT n1 FROM t) AS n_second
FROM d""",
        # text.analysis.lexicon_screen: token-membership counts (the
        # lang_id lookaround≡membership equivalence); keep compares
        # the UNROUNDED fraction.
        "lexicon_screen": """
WITH b AS (SELECT doc_id,
  CAST(length(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
    AS n_words,
  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
       x -> list_contains(['buy','click','deal','free','offer',
                           'prize','subscribe','winner'], x)))
    AS BIGINT) AS n_hits
FROM documents)
SELECT doc_id, n_words, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / greatest(n_words, 1), 9)
         AS hit_frac,
       (CAST(n_hits AS DOUBLE) / greatest(n_words, 1)) <= 0.05 AS keep
FROM b""",
        # dedup_agreement: exact-Jaccard text pairs (the minhash_dedup
        # verify rule) × cosine embedding pairs; flagged-id set fold.
        "dedup_agreement": r"""
WITH s AS (
  SELECT doc_id,
    list_distinct([substr(x, i, 5) for i in range(1, greatest(length(x)-3, 2))]) AS gr
  FROM (SELECT doc_id,
        rpad(y, CAST(greatest(length(y), 5) AS INTEGER), ' ') AS x
        FROM (SELECT doc_id,
              regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g') AS y
              FROM documents)) ),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
            (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) >= 0.7),
tf AS (SELECT DISTINCT u AS id FROM
       (SELECT doc_a AS u FROM p UNION ALL SELECT doc_b FROM p)),
pe AS (SELECT a.vec_id AS ea, b.vec_id AS eb
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.45),
ef AS (SELECT DISTINCT u AS id FROM
       (SELECT ea AS u FROM pe UNION ALL SELECT eb FROM pe)),
bt AS (SELECT COUNT(*) AS c FROM tf JOIN ef ON ef.id = tf.id),
ei AS (SELECT COUNT(*) AS c FROM
       (SELECT id FROM tf UNION SELECT id FROM ef))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tf) AS n_text_dup,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ef) AS n_emb_dup,
       (SELECT CAST(c AS BIGINT) FROM bt) AS n_both,
       (SELECT CAST(c AS BIGINT) FROM ei) AS n_either,
       ROUND(CAST((SELECT c FROM bt) AS DOUBLE)
             / (SELECT c FROM ei), 9) AS overlap_jaccard""",
        # graph.temporal.monthly_edge_overlap: consecutive observed
        # months' distinct-edge Jaccard.
        "monthly_edge_overlap": """
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
om AS (SELECT o_orderkey,
              CAST(date_part('year', o_orderdate) * 100
                   + date_part('month', o_orderdate) AS BIGINT) AS month
       FROM orders),
e AS (SELECT DISTINCT om.month, a.l_partkey AS src, b.l_partkey AS dst
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN om ON om.o_orderkey = a.l_orderkey),
mo AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY month),
pr AS (SELECT m1.month AS ma,
              (SELECT MIN(m2.month) FROM mo m2 WHERE m2.month > m1.month)
                AS mb
       FROM mo m1
       WHERE EXISTS (SELECT 1 FROM mo m2 WHERE m2.month > m1.month)),
bt AS (SELECT p.ma, p.mb, COUNT(*) AS n_both
       FROM pr p JOIN e a ON a.month = p.ma
       JOIN e b ON b.month = p.mb AND b.src = a.src AND b.dst = a.dst
       GROUP BY p.ma, p.mb)
SELECT p.ma AS month_a, p.mb AS month_b, na.n AS n_a, nb2.n AS n_b,
       CAST(COALESCE(bt.n_both, 0) AS BIGINT) AS n_both,
       ROUND(CAST(COALESCE(bt.n_both, 0) AS DOUBLE)
             / (na.n + nb2.n - COALESCE(bt.n_both, 0)), 9) AS jaccard
FROM pr p JOIN mo na ON na.month = p.ma
JOIN mo nb2 ON nb2.month = p.mb
LEFT JOIN bt ON bt.ma = p.ma AND bt.mb = p.mb
ORDER BY month_a""",
        # local bridges: zero-triangle edges (the edge_triangles CTE
        # folded to a summary).
        "local_bridges": f"""
WITH {_E_CTE}, {_S_CTE},
et AS (SELECT e.src, e.dst, CAST(COUNT(s2.dst) AS BIGINT) AS triangle
       FROM e LEFT JOIN s s1 ON s1.src = e.src
              LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
       GROUP BY e.src, e.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS m,
       CAST(COALESCE(SUM(CASE WHEN triangle = 0 THEN 1 END), 0) AS BIGINT)
         AS n_local_bridges,
       ROUND(CAST(COALESCE(SUM(CASE WHEN triangle = 0 THEN 1 END), 0)
                  AS DOUBLE) / COUNT(*), 9) AS bridge_frac
FROM et""",
        # stages.conv_stats.tool_colift: conversation-level co-usage
        # lift; only co-occurring pairs appear.
        "tool_colift": f"""
WITH {_T_CTE},
p AS (SELECT DISTINCT conv_id, tool FROM t),
nc AS (SELECT CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n FROM p),
sz AS (SELECT tool, CAST(COUNT(*) AS BIGINT) AS na FROM p GROUP BY 1),
it AS (SELECT a.tool AS ta, b.tool AS tb, CAST(COUNT(*) AS BIGINT) AS nb
       FROM p a JOIN p b ON a.conv_id = b.conv_id AND a.tool < b.tool
       GROUP BY 1, 2)
SELECT ta AS tool_a, tb AS tool_b, it.nb AS n_both,
       sa.na AS n_a, sb.na AS n_b, (SELECT n FROM nc) AS n_convs,
       ROUND((CAST(it.nb AS DOUBLE) / (SELECT n FROM nc))
             / ((CAST(sa.na AS DOUBLE) / (SELECT n FROM nc))
                * (CAST(sb.na AS DOUBLE) / (SELECT n FROM nc))), 9)
         AS lift
FROM it JOIN sz sa ON sa.tool = it.ta JOIN sz sb ON sb.tool = it.tb""",
        # stages.rfm.revenue_pareto: integer-cents top-decile share
        # (tiebreak-agnostic top-k sum).
        "revenue_pareto": """
WITH pc AS (SELECT o_custkey,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc),
kk AS (SELECT CAST(CEIL(0.1 * (SELECT n FROM nn)) AS BIGINT) AS k),
rk AS (SELECT cents,
              row_number() OVER (ORDER BY cents DESC, o_custkey) AS r
       FROM pc)
SELECT (SELECT n FROM nn) AS n_customers,
       (SELECT k FROM kk) AS top_k,
       (SELECT CAST(SUM(cents) AS BIGINT) FROM pc) AS total_cents,
       (SELECT CAST(SUM(cents) AS BIGINT) FROM rk
        WHERE r <= (SELECT k FROM kk)) AS top_cents,
       ROUND(CAST((SELECT SUM(cents) FROM rk
                   WHERE r <= (SELECT k FROM kk)) AS DOUBLE)
             / (SELECT SUM(cents) FROM pc), 9) AS share""",
        # text.dedup.containment_pairs: the ngram_jaccard pair set
        # annotated with both asymmetric containments.
        "containment_pairs": r"""
WITH s AS (
  SELECT doc_id,
    list_distinct([substr(x, i, 5) for i in range(1, greatest(length(x)-3, 2))]) AS gr
  FROM (SELECT doc_id,
        rpad(y, CAST(greatest(length(y), 5) AS INTEGER), ' ') AS x
        FROM (SELECT doc_id,
              regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g') AS y
              FROM documents)) ),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.gr, b.gr)) AS i,
             len(a.gr) AS la, len(b.gr) AS lb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE) /
            (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr)))
            >= 0.45)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / (la + lb - i), 6) AS jaccard,
       ROUND(CAST(i AS DOUBLE) / la, 6) AS cont_a,
       ROUND(CAST(i AS DOUBLE) / lb, 6) AS cont_b
FROM p""",
        # stages.distinct.distinct_rows over (user, type, day).
        "distinct_triples": """
SELECT DISTINCT user_id, event_type,
       epoch_us(ts) // 86400000000 AS day
FROM events""",
        # text.analysis.vocab_coverage: cumulative occurrence mass of
        # the (count DESC, token) ranked vocabulary head.
        "vocab_coverage": """
WITH tok AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS token
             FROM documents),
t AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM t),
vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM t),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r FROM t),
cm AS (SELECT r, SUM(c) OVER (ORDER BY r) AS cum FROM rk),
ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (10), (100), (1000)) t(k))
SELECT ks.k,
       CAST(LEAST(ks.k, (SELECT v FROM vs)) AS BIGINT) AS n_top,
       CAST(COALESCE((SELECT cum FROM cm
                      WHERE r = LEAST(ks.k, (SELECT v FROM vs))), 0)
            AS BIGINT) AS covered,
       (SELECT total FROM tot) AS total,
       ROUND(CAST(COALESCE((SELECT cum FROM cm
                            WHERE r = LEAST(ks.k, (SELECT v FROM vs))), 0)
                  AS DOUBLE) / (SELECT total FROM tot), 9) AS coverage
FROM ks ORDER BY ks.k""",
        # stages.windows.peak_concurrency: line sweep over session
        # intervals (+1 at start, −1 at end+1; −1 FIRST at ties — the
        # exclusive-end convention, matching the engine).
        "peak_concurrency": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
o AS (SELECT *, lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > 1800000000
                     THEN 1 ELSE 0 END AS new_s FROM o),
g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS sidx
      FROM f),
sess AS (SELECT user_id, sidx, MIN(ts) AS start_ts, MAX(ts) AS end_ts
         FROM g GROUP BY user_id, sidx),
d AS (SELECT start_ts AS t, 1 AS dl, 1 AS oo FROM sess
      UNION ALL SELECT end_ts + 1, -1, 0 FROM sess),
r AS (SELECT t, SUM(dl) OVER (ORDER BY t, oo
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM d),
pk AS (SELECT CAST(MAX(run) AS BIGINT) AS p FROM r)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sess) AS n_sessions,
       (SELECT p FROM pk) AS peak,
       (SELECT CAST(MIN(t) AS BIGINT) FROM r
        WHERE run = (SELECT p FROM pk)) AS peak_at_us""",
        # stages.skyline.skyline_parts: NOT EXISTS dominance.
        "skyline_parts": """
SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
ORDER BY p_partkey""",
        # stages.conv_stats.latency_quantiles: per-role exact gap
        # quantiles at the floor(q·(n−1)) rank rule.
        "latency_quantiles": f"""
WITH {_T_CTE},
p AS (SELECT conv_id, role, turn_idx, epoch_us(ts) AS tu,
             LAG(epoch_us(ts)) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev
      FROM t),
gp AS (SELECT role, tu - prev AS gap FROM p WHERE prev IS NOT NULL),
rk AS (SELECT role, gap,
              row_number() OVER (PARTITION BY role ORDER BY gap) - 1 AS r,
              COUNT(*) OVER (PARTITION BY role) AS n
       FROM gp),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) t(q))
SELECT rk.role, qs.q, CAST(rk.gap AS BIGINT) AS value
FROM qs JOIN rk ON rk.r = CAST(FLOOR(qs.q * (rk.n - 1)) AS BIGINT)
ORDER BY rk.role, qs.q""",
        # Forman-Ricci curvature: 4 − deg(u) − deg(v) + 3·tri(e).
        "forman_curvature": f"""
WITH {_E_CTE}, {_S_CTE}, {_D_CTE},
et AS (SELECT e.src, e.dst, CAST(COUNT(s2.dst) AS BIGINT) AS triangle
       FROM e LEFT JOIN s s1 ON s1.src = e.src
              LEFT JOIN s s2 ON s2.src = e.dst AND s2.dst = s1.dst
       GROUP BY e.src, e.dst)
SELECT et.src, et.dst,
       CAST(4 - du.degree - dv.degree + 3 * et.triangle AS BIGINT)
         AS curvature
FROM et JOIN d du ON du.v = et.src JOIN d dv ON dv.v = et.dst
ORDER BY et.src, et.dst""",
        # graph.linkpred.negative_edges: bit-exact splitmix proposal
        # stream, dense ids = ascending-rank of the vertex universe.
        "negative_edges": f"""
WITH {_E_CTE}, {_S_CTE},
den AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS d
        FROM (SELECT DISTINCT src AS v FROM s)),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM den),
cs AS (SELECT CAST(gs.generate_series AS BIGINT) AS c
       FROM generate_series(0, 3999) gs),
prop AS (SELECT c,
  CAST({_splitmix_sql('2*c', '0')} % (SELECT n FROM nn) AS BIGINT) AS u,
  CAST({_splitmix_sql('2*c + 1', '0')} % (SELECT n FROM nn) AS BIGINT) AS v
  FROM cs),
ed AS (SELECT da.d AS lo, db.d AS hi
       FROM e JOIN den da ON da.v = e.src JOIN den db ON db.v = e.dst),
acc AS (SELECT c, LEAST(u, v) AS lo, GREATEST(u, v) AS hi
        FROM prop WHERE u <> v),
neg AS (SELECT acc.c, acc.lo, acc.hi FROM acc
        LEFT JOIN ed ON ed.lo = acc.lo AND ed.hi = acc.hi
        WHERE ed.lo IS NULL ORDER BY acc.c LIMIT 500)
SELECT neg.c, dl.v AS src, dh.v AS dst
FROM neg JOIN den dl ON dl.d = neg.lo JOIN den dh ON dh.d = neg.hi
ORDER BY neg.c""",
        # dow × hour heatmap; dow 0 = Monday.
        "hour_heatmap": """
SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
       CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY dow, hour""",
        # text.analysis.term_dispersion: cf/df burstiness, top-50 by
        # (cf DESC, token).
        "term_dispersion": """
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(text, '[A-Za-z]+')) AS token
             FROM documents),
cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf
       FROM tok GROUP BY token),
dfx AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY token),
top AS (SELECT cf.token, cf.cf, dfx.df
        FROM cf JOIN dfx ON dfx.token = cf.token
        ORDER BY cf.cf DESC, cf.token LIMIT 50)
SELECT token, cf, df, ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness
FROM top""",
        # stages.windows.lateness_profile: running-max lateness in
        # log2-second buckets (-1 = on-time).
        "lateness_profile": """
WITH s0 AS (SELECT event_id, epoch_us(ts) AS tu FROM events),
r AS (SELECT event_id, tu,
             MAX(tu) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mx
      FROM s0),
l AS (SELECT CASE WHEN mx IS NULL OR mx - tu <= 0 THEN -1
             ELSE CAST(FLOOR(LOG2(GREATEST((mx - tu) // 1000000, 1)))
                       AS BIGINT) END AS bucket
      FROM r),
g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM l GROUP BY bucket),
t AS (SELECT SUM(n) AS tot FROM g)
SELECT bucket, n,
       ROUND(CAST(SUM(n) OVER (ORDER BY bucket) AS DOUBLE)
             / (SELECT tot FROM t), 9) AS cum_frac
FROM g ORDER BY bucket""",
        # stages.conv_stats.conv_typicality: mean transition NLL per
        # conversation under the corpus MLE chain.
        "conv_typicality": f"""
WITH {_T_CTE},
g AS (SELECT conv_id, tool AS a,
             LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
      FROM t),
c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM g WHERE b IS NOT NULL GROUP BY 1, 2),
w AS (SELECT a, CAST(SUM(n) AS BIGINT) AS w FROM c GROUP BY a),
lp AS (SELECT c.a, c.b, ln(CAST(c.n AS DOUBLE) / w.w) AS lp
       FROM c JOIN w ON w.a = c.a),
pc AS (SELECT g.conv_id, CAST(COUNT(*) AS BIGINT) AS n, SUM(lp.lp) AS s
       FROM g JOIN lp ON lp.a = g.a AND lp.b = g.b
       WHERE g.b IS NOT NULL GROUP BY g.conv_id)
SELECT conv_id, n AS n_trans, ROUND(-s / n, 9) AS nll
FROM pc ORDER BY conv_id""",
        # stages.regress.anova_value_by_type: one-way F from group
        # moments.
        "anova_value_type": """
WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(value) AS s1, SUM(value * value) AS s2
           FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n, SUM(s1) AS ts1 FROM g),
x AS (SELECT (SELECT k FROM t) AS k, (SELECT n FROM t) AS n,
             SUM(n * POW(s1 / n - (SELECT ts1 / n FROM t), 2)) AS ssb,
             SUM(s2 - s1 * s1 / n) AS ssw
      FROM g)
SELECT k, n, ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
FROM x""",
        # stages.conv_stats.role_pair_latency: gap credited to the
        # (prev role, next role) pair; integer µs sums, /1e6 at the
        # end (the response_latency contract).
        "role_pair_latency": f"""
WITH {_T_CTE},
p AS (SELECT conv_id, role, turn_idx, epoch_us(ts) AS tu,
             LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS prev_role,
             LAG(epoch_us(ts)) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_tu
      FROM t)
SELECT prev_role AS role_a, role AS role_b,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(tu - prev_tu) AS DOUBLE) / 1000000.0
             / COUNT(*), 6) AS mean_gap_s
FROM p WHERE prev_role IS NOT NULL
GROUP BY 1, 2 ORDER BY role_a, role_b""",
        # text.dedup.source_dup_rate: exact-dup rate per source; md5
        # distinct mirrors the engine's 128-bit content hash (both
        # are injective on this corpus by construction).
        "source_dup_rate": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
             / COUNT(*), 9) AS dup_frac
FROM documents GROUP BY source ORDER BY source""",
        # stages.windows.type_daily_corr: Pearson over union-of-days
        # aligned series, missing (type, day) = 0.
        "type_daily_corr": """
WITH dd AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM dd),
tys AS (SELECT DISTINCT event_type FROM dd),
grid AS (SELECT t.event_type, d.day,
                CAST(COALESCE(dd.n, 0) AS DOUBLE) AS x
         FROM tys t CROSS JOIN days d
         LEFT JOIN dd ON dd.event_type = t.event_type AND dd.day = d.day),
mu AS (SELECT event_type, AVG(x) AS m FROM grid GROUP BY 1),
c AS (SELECT g.event_type, g.day, g.x - mu.m AS cx
      FROM grid g JOIN mu ON mu.event_type = g.event_type),
pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
              SUM(a.cx * b.cx) AS sxy
       FROM c a JOIN c b ON a.day = b.day
         AND a.event_type < b.event_type
       GROUP BY 1, 2),
ss AS (SELECT event_type, SUM(cx * cx) AS s2 FROM c GROUP BY 1)
SELECT pr.ta AS type_a, pr.tb AS type_b,
       ROUND(CASE WHEN sa.s2 > 0 AND sb.s2 > 0
                  THEN pr.sxy / sqrt(sa.s2 * sb.s2)
                  ELSE 0.0 END, 9) AS r
FROM pr JOIN ss sa ON sa.event_type = pr.ta
JOIN ss sb ON sb.event_type = pr.tb
ORDER BY type_a, type_b""",
        # embedding-norm exact quantiles (floor(q·(n−1)) rank rule).
        "norm_quantiles": """
WITH x AS (SELECT sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), v -> v * v))) AS norm
           FROM embeddings),
rk AS (SELECT norm, row_number() OVER (ORDER BY norm) - 1 AS r,
              COUNT(*) OVER () AS n
       FROM x),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) t(q))
SELECT qs.q, ROUND(rk.norm, 6) AS value
FROM qs JOIN rk ON rk.r = CAST(FLOOR(qs.q * (rk.n - 1)) AS BIGINT)
ORDER BY qs.q""",
    }
    # rbo_rankings reuses the rrf_fusion ranker chains: truncated
    # rank-biased overlap at the dynamic depth min(|A|, |B|)
    _rrf = out["rrf_fusion"]
    _rank_ctes = _rrf[: _rrf.index(",\nu AS (")]  # ...rbm, q0, sims, rc0, rcos
    out["rbo_rankings"] = f"""{_rank_ctes},
kk AS (SELECT LEAST((SELECT COUNT(*) FROM rbm),
                    (SELECT COUNT(*) FROM rcos)) AS k),
ds AS (SELECT CAST(gs.generate_series AS BIGINT) AS d
       FROM generate_series(1, 20) gs
       WHERE gs.generate_series <= (SELECT k FROM kk)),
ov AS (SELECT ds.d, COUNT(rc.id) AS inter
       FROM ds
       LEFT JOIN rbm rb ON rb.rk <= ds.d
       LEFT JOIN rcos rc ON rc.id = rb.id AND rc.rk <= ds.d
       GROUP BY ds.d)
SELECT (SELECT CAST(k AS BIGINT) FROM kk) AS k,
       CAST(0.9 AS DOUBLE) AS p,
       ROUND(CAST((SELECT inter FROM ov WHERE d = (SELECT k FROM kk))
                  AS DOUBLE) / (SELECT k FROM kk), 9) AS overlap_at_k,
       ROUND((1 - 0.9) * (SELECT SUM(POW(0.9, d - 1) * inter / d)
                          FROM ov), 9) AS rbo"""
    # centrality_spearman reuses the full pagerank oracle as a
    # derived table; integer 2·avg-rank moments (orbit_spearman
    # contract)
    out["centrality_spearman"] = f"""
WITH pr0 AS (SELECT * FROM ({out['pagerank_copurchase']}) q),
{_E_CTE}, {_S_CTE}, {_D_CTE},
o AS (SELECT pr0.v, pr0.score AS x, CAST(d.degree AS BIGINT) AS y
      FROM pr0 JOIN d ON d.v = pr0.v),
hx AS (SELECT x AS val, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1),
wx AS (SELECT val,
              CAST(2 * COALESCE(SUM(c) OVER (ORDER BY val
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) + c + 1 AS BIGINT) AS r2
       FROM hx),
hy AS (SELECT y AS val, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1),
wy AS (SELECT val,
              CAST(2 * COALESCE(SUM(c) OVER (ORDER BY val
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) + c + 1 AS BIGINT) AS r2
       FROM hy),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(wx.r2) AS HUGEINT) AS sx,
             CAST(SUM(wy.r2) AS HUGEINT) AS sy,
             CAST(SUM(wx.r2 * wx.r2) AS HUGEINT) AS sxx,
             CAST(SUM(wy.r2 * wy.r2) AS HUGEINT) AS syy,
             CAST(SUM(wx.r2 * wy.r2) AS HUGEINT) AS sxy
      FROM o JOIN wx ON wx.val = o.x JOIN wy ON wy.val = o.y)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                  THEN CAST(n*sxy - sx*sy AS DOUBLE)
                       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                              * CAST(n*syy - sy*sy AS DOUBLE))
                  ELSE 0.0 END, 9) AS rho
FROM m"""
    # coarsen_stats reuses the full matching oracle as a derived
    # table (its WITH RECURSIVE nests fine inside a subquery)
    out["coarsen_stats"] = f"""
WITH mt AS (SELECT * FROM ({out['matching_copurchase']}) q),
{_E_CTE},
sup AS (SELECT v, CASE WHEN mate >= 0 THEN LEAST(v, mate) ELSE v END AS s
        FROM mt),
ce AS (SELECT DISTINCT LEAST(sa.s, sb.s) AS lo, GREATEST(sa.s, sb.s) AS hi
       FROM e JOIN sup sa ON sa.v = e.src JOIN sup sb ON sb.v = e.dst
       WHERE sa.s <> sb.s),
base AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sup) AS n,
                (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM sup)
                  AS n_super,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS m,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM ce) AS m_coarse)
SELECT n, n_super, m, m_coarse,
       ROUND(CAST(n_super AS DOUBLE) / n, 9) AS node_ratio,
       ROUND(CAST(m_coarse AS DOUBLE) / m, 9) AS edge_ratio
FROM base"""
    return out
