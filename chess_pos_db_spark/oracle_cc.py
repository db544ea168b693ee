"""Shared DuckDB-oracle CTE builders for connected-component closures.

Used by the dedup component oracles (llm/dedup.py) and the ER-resolve
oracle (operators/joins.py). These build the ORACLE side only — the
engine side is the Spark contraction/star implementations those modules
own.

The naive oracle closure — walk(node,label) propagating EVERY label
along EVERY candidate pair to a fixpoint — materializes the full
(node, reachable-label) relation: quadratic in component size, over a
candidate graph that at sf0.1 is near-complete (9.9M pairs / 5000
docs), so DuckDB ran past the sweep's 90 s watchdog (>400 s measured).
Two EXACT, connectivity-preserving reductions fix the oracle without
changing what either side computes:

 * STAR_CC_CTES — band buckets are CLIQUES in the candidate-pair
   graph (every two members of a bucket collide), and replacing each
   clique with a star to its minimum member preserves connectivity,
   so the closure runs over ~|banded| star edges instead of all
   bucket pairs (measured 2.9 s vs >400 s at sf0.1, identical rows).
 * the walk prune WHERE w.label < e.v — a propagated label can only
   be a node's component MIN if it is smaller than the node; the
   true component minimum is smaller than every member so it is
   never pruned anywhere along any path (any intermediate that would
   prune it is itself a smaller label flowing onward).
 * hybrid_cc_ctes — for ARBITRARY edge sets (exact-verified pairs,
   fuzzy-match graphs) with no clique structure to exploit: two
   unrolled min-neighbor contraction rounds (each near-clique
   collapses onto its minimum) followed by the pruned recursive
   closure on the tiny residual graph. Exact for ANY graph: each
   contraction maps every node to a same-component node, the
   component minimum maps to itself, and the final recursion is the
   exact fixpoint on a connectivity-equivalent graph. MATERIALIZED
   hints stop DuckDB 1.0 from inlining (= re-evaluating) the
   multiply-referenced CTEs, which otherwise compounds exponentially
   across the two rounds.
"""

# Expects CTEs `banded(doc_id, band_idx, band_hash)` and a `documents`
# view in scope; ends in `walk(node, label)` whose per-node MIN(label)
# is the component root.
STAR_CC_CTES = """reps AS (
    SELECT band_idx, band_hash, MIN(doc_id) AS rep
    FROM banded GROUP BY band_idx, band_hash
),
star_edges AS MATERIALIZED (
    SELECT DISTINCT b.doc_id AS u, r.rep AS v
    FROM banded b JOIN reps r USING (band_idx, band_hash)
    WHERE b.doc_id <> r.rep
),
edges AS MATERIALIZED (
    SELECT u, v FROM star_edges UNION ALL SELECT v, u FROM star_edges
),
walk(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    WHERE w.label < e.v
)"""


def hybrid_cc_ctes(
    pair_cte: str, a_col: str, b_col: str, nodes_from: str, node_col: str
) -> str:
    """CTE chain ending in ``cc(node, root)``: components of the
    undirected graph given by ``pair_cte(a_col, b_col)`` over the node
    set ``nodes_from.node_col``, root = component minimum."""
    return f"""edges0 AS MATERIALIZED (
    SELECT {a_col} AS u, {b_col} AS v FROM {pair_cte}
    UNION ALL
    SELECT {b_col} AS u, {a_col} AS v FROM {pair_cte}
),
nodes0 AS (SELECT {node_col} AS node FROM {nodes_from}),
m1 AS MATERIALIZED (
    SELECT n.node, LEAST(n.node, COALESCE(MIN(e.v), n.node)) AS m
    FROM nodes0 n LEFT JOIN edges0 e ON e.u = n.node
    GROUP BY n.node
),
edges1 AS MATERIALIZED (
    SELECT DISTINCT a.m AS u, b.m AS v
    FROM edges0 e JOIN m1 a ON a.node = e.u JOIN m1 b ON b.node = e.v
    WHERE a.m <> b.m
),
nodes1 AS (SELECT DISTINCT m AS node FROM m1),
m2 AS MATERIALIZED (
    SELECT n.node, LEAST(n.node, COALESCE(MIN(e.v), n.node)) AS m
    FROM nodes1 n LEFT JOIN edges1 e ON e.u = n.node
    GROUP BY n.node
),
edges2 AS MATERIALIZED (
    SELECT DISTINCT a.m AS u, b.m AS v
    FROM edges1 e JOIN m2 a ON a.node = e.u JOIN m2 b ON b.node = e.v
    WHERE a.m <> b.m
),
nodes2 AS (SELECT DISTINCT m AS node FROM m2),
walk(node, label) AS (
    SELECT node, node FROM nodes2
    UNION
    SELECT e.v, w.label FROM walk w JOIN edges2 e ON e.u = w.node
    WHERE w.label < e.v
),
closure AS MATERIALIZED (
    SELECT node, MIN(label) AS root FROM walk GROUP BY node
),
cc AS (
    SELECT n.node, c.root
    FROM nodes0 n
    JOIN m1 ON m1.node = n.node
    JOIN m2 ON m2.node = m1.m
    JOIN closure c ON c.node = m2.m
)"""
