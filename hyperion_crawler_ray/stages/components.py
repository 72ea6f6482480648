"""Distributed connected components over a near-duplicate pair graph, and
the fuzzy-dedup application built on it (keep one canonical document per
duplicate cluster).

The near-dup family (``stages/dedup.py``, ``stages/kmeans.py``) emits
PAIRS — ``(id_a, id_b, score)`` — but actual deduplication needs the
transitive closure: if a~b and b~c, then {a, b, c} is ONE cluster and two
of the three must go. That closure is connected components over the pair
graph, computed here by iterative min-label propagation:

    label(x) := x initially
    each round, every edge (u, v) offers label(u) to v and label(v) to u;
    label(x) := min(label(x), offers)            -- monotone, vectorized
    stop when no label changed

expressed Ray-Data-first: the edge list and the label table are both
Datasets; one round = a partitioned ``hash_join`` (edges x labels on the
source endpoint) to build the offers, then a ``groupby(node).min(label)``
to fold them in — two all-to-alls over the EDGE set per round, never the
corpus. Labels only decrease, so ``sum(label)`` is strictly decreasing
until the fixpoint — an O(1)-per-round convergence check with no
driver-side label diff.

Scale notes (100-TB design point):
- The pair graph is sparse relative to the corpus (LSH/SemDeDup emit
  pairs only above threshold, mega-clusters are star-capped at the
  source — ``dedup.py`` cluster_cap — so edge count is O(dups), not
  O(n^2)); everything here is sized to the graph, not the corpus.
- Rounds needed = component diameter. Near-dup clusters are dense (LSH
  band buckets and star caps connect members through shared
  representatives), so diameter is typically <= 4; ``max_iters`` is a
  guard, and non-convergence RAISES rather than returning silently
  partial labels (a partial label split would under-dedup).
- The canonical representative is the component's MIN id —
  deterministic, layout-independent, and the same winner rule the exact
  dedup family uses (SURVEY §2.7 D-1).

Public-knowledge basis: label propagation for connected components is
the textbook Pregel/BSP formulation (Malewicz et al. 2010); the
MapReduce min-label variant is Kiveris et al. 2014 ("Connected
Components in MapReduce and Beyond").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from . import joins as jn
from .exchange import coalesce_tiny as _coalesce_tiny

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_LABEL_SCHEMA = pa.schema([("src", pa.int64()), ("label", pa.int64())])


def _driver_components(edges: rd.Dataset, node_col: str,
                       comp_col: str) -> rd.Dataset:
    """Bounded driver fast path: union-find with path compression over a
    SMALL edge set (caller enforces the bound). Same output contract as
    the distributed path — pytest asserts equality on shared inputs."""
    t = pa.concat_tables(edges.iter_batches(batch_format="pyarrow"))
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return rd.from_arrow(pa.table({
        node_col: pa.array(nodes, pa.int64()),
        comp_col: pa.array([find(x) for x in nodes], pa.int64())}))


def _driver_components_oracle_check(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find with path compression over a pandas pair frame — the
    exact oracle tools/components_bench.py and the tests compare the
    distributed propagation against. Driver-side by design (bench/test
    only)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["id_a"].tolist(), pairs_df["id_b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pd.DataFrame({"node": np.array(nodes, np.int64),
                         "component": np.array([find(x) for x in nodes],
                                               np.int64)})


def connected_components(pairs: rd.Dataset, id_a: str = "id_a",
                         id_b: str = "id_b", node_col: str = "node",
                         comp_col: str = "component", max_iters: int = 30,
                         num_partitions: int = 16,
                         driver_small_edges: int = 200_000,
                         round_times: list | None = None) -> rd.Dataset:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id of its connected component.
    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iters`` rounds (diameter > max_iters — raise the bound).

    Graphs with at most ``driver_small_edges`` (directed) edges take a
    BOUNDED driver fast path (union-find, the crawl frontier's
    ``driver_small_round_rows`` pattern — the iterative distributed
    rounds each pay a fixed shuffle cost that dwarfs a tiny graph);
    pytest asserts the two paths equal. Set it to 0 to force the
    distributed path. ``round_times``, when given a list, receives the
    wall seconds of each propagation round (tools/components_bench.py —
    the per-round cost must stay FLAT across rounds; superlinear growth
    means tiny-block accumulation is back)."""
    import time as _time

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])},
                        schema=_EDGE_SCHEMA)

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({node_col: pa.array([], pa.int64()),
                                       comp_col: pa.array([], pa.int64())}))
    if n_edges <= driver_small_edges:
        return _driver_components(edges, node_col, comp_col)
    # size the per-round exchange to the GRAPH, not the default: every
    # round pays num_partitions tasks of fixed overhead, and dup graphs
    # are usually tiny next to the corpus
    num_partitions = min(num_partitions, max(1, n_edges // 8192 + 1))

    # initial labels: one row per distinct node, label = node. The
    # symmetric edge list already contains every node as a src.
    labels = edges.select_columns(["src"]).groupby("src").count() \
        .map_batches(lambda t: pa.table(
            {"src": t.column("src").cast(pa.int64()),
             "label": t.column("src").cast(pa.int64())},
            schema=_LABEL_SCHEMA), batch_format="pyarrow").materialize()

    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        _rt0 = _time.perf_counter()
        # offers: each edge forwards its src's current label to dst
        joined = jn.hash_join(edges, labels, on="src",
                              num_partitions=num_partitions,
                              left_schema=_EDGE_SCHEMA,
                              right_schema=_LABEL_SCHEMA)
        offers = joined.map_batches(lambda t: pa.table(
            {"src": t.column("dst").cast(pa.int64()),
             "label": t.column("label").cast(pa.int64())},
            schema=_LABEL_SCHEMA), batch_format="pyarrow")
        # coalesce every round: groupby+union fragment the label table
        # into ever more tiny blocks, and without this the per-round
        # cost GROWS round over round (measured 0.5 s -> 27 s by round 7
        # on a 60-node graph)
        labels = _coalesce_tiny(
            labels.union(offers).groupby("src").min("label")
            .map_batches(lambda t: pa.table(
                {"src": t.column("src").cast(pa.int64()),
                 "label": t.column("min(label)").cast(pa.int64())},
                schema=_LABEL_SCHEMA), batch_format="pyarrow").materialize())
        cur_sum = labels.sum("label")
        if round_times is not None:
            round_times.append(round(_time.perf_counter() - _rt0, 3))
        if cur_sum == prev_sum:      # labels are monotone non-increasing:
            break                    # equal sum == fixpoint, exactly
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "(component diameter exceeds max_iters)")

    return labels.map_batches(lambda t: pa.table(
        {node_col: t.column("src"), comp_col: t.column("label")}),
        batch_format="pyarrow")


def fuzzy_dedup_docs(docs: rd.Dataset, pairs: rd.Dataset,
                     id_col: str = "doc_id",
                     num_partitions: int = 16,
                     max_iters: int = 30,
                     components: rd.Dataset | None = None) -> rd.Dataset:
    """Drop every document that near-duplicates a lower-id document:
    connected components over ``pairs``, then a distributed ANTI join of
    ``docs`` against the non-representative members (node != component).
    Nothing is collected to the driver — the loser set can be
    O(corpus). Pass ``components`` (a (node, component) dataset) when
    the caller already ran the closure, to avoid recomputing it."""
    comp = components if components is not None else \
        connected_components(pairs, max_iters=max_iters,
                             num_partitions=num_partitions)

    def losers(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("node"), t.column("component"))
        return pa.table({id_col: t.filter(keep).column("node")})

    dup_ids = comp.map_batches(losers, batch_format="pyarrow")
    # explicit right schema: a schema() probe on the lazy loser chain
    # returns None when the component set is empty
    return jn.semi_join_large(docs, dup_ids, on=id_col, how="anti",
                              num_partitions=num_partitions,
                              right_schema=pa.schema([(id_col,
                                                       pa.int64())]))
