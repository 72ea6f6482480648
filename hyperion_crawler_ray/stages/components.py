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

expressed as a STATICALLY CO-PARTITIONED task graph (round 4): edges are
hash-partitioned by ``src`` ONCE before the loop and labels live as one
sorted Arrow table per partition (every node's label is in the partition
its hash says — the same invariant the crawl's seen-shards use). One
round is then P offer tasks (local sorted-searchsorted join of the
partition's edges against its labels, output split by ``hash(dst)``) and
P merge tasks (fold offers into the local labels with a vectorized min)
— the ONLY data that moves is the offers, and nothing re-executes a
Dataset per round. Rounds 1-3 ran each round as Ray Data
``hash_join`` + ``groupby().min()`` executions, which pay seconds of
fixed sample/sort/reduce latency per round at ANY size (measured 18-26 s
/round on a 1.2M-edge graph; the task-graph form runs the same round in
well under a second). Convergence: each merge task reports how many of
its labels changed; all-zero means fixpoint, exactly.

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
_PART_K = np.uint64(2654435761)          # Knuth multiplicative hash


def _part_of(nodes: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic partition id per node — the SINGLE placement rule
    every task below shares (a node's label always lives in exactly this
    partition)."""
    with np.errstate(over="ignore"):
        return ((nodes.astype(np.uint64) * _PART_K)
                >> np.uint64(16)).astype(np.int64) % n_parts


import ray  # noqa: E402


@ray.remote
def _cc_split_edges(tbl: pa.Table, n_parts: int):
    """Partition one symmetric-edge block by hash(src): num_returns=
    n_parts zero-copy slices (argsort + searchsorted)."""
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    p = _part_of(src, n_parts)
    order = np.argsort(p, kind="stable")
    t2 = tbl.take(pa.array(order))
    bounds = np.searchsorted(p[order], np.arange(n_parts + 1))
    out = tuple(t2.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                for k in range(n_parts))
    return out if n_parts > 1 else out[0]


@ray.remote
def _cc_build_part(*pieces: pa.Table):
    """One edge partition: concat its slices, sort by src, and derive
    the initial label table (unique srcs, label = src). Returns
    (edges_sorted, labels_sorted) — both stay in the object store."""
    live = [p for p in pieces if p is not None and p.num_rows]
    if not live:
        e = _EDGE_SCHEMA.empty_table()
        return e, _LABEL_SCHEMA.empty_table()
    t = pa.concat_tables(live)
    src = t.column("src").to_numpy(zero_copy_only=False)
    order = np.argsort(src, kind="stable")
    t = t.take(pa.array(order))
    uniq = np.unique(src)
    labels = pa.table({"src": uniq, "label": uniq.copy()},
                      schema=_LABEL_SCHEMA)
    return t, labels


@ray.remote
def _cc_offers(part, n_parts: int):
    """One propagation half-round for one partition: join the local
    (src-sorted) edges against the local (src-sorted) labels via
    searchsorted, emit (dst, label) offers split by hash(dst)."""
    edges, labels = part
    empty = _LABEL_SCHEMA.empty_table()
    if edges.num_rows == 0:
        out = tuple(empty for _ in range(n_parts))
        return out if n_parts > 1 else out[0]
    e_src = edges.column("src").to_numpy(zero_copy_only=False)
    e_dst = edges.column("dst").to_numpy(zero_copy_only=False)
    l_src = labels.column("src").to_numpy(zero_copy_only=False)
    l_lab = labels.column("label").to_numpy(zero_copy_only=False)
    lab = l_lab[np.searchsorted(l_src, e_src)]   # every src has a label
    p = _part_of(e_dst, n_parts)
    order = np.argsort(p, kind="stable")
    dst_s, lab_s = e_dst[order], lab[order]
    bounds = np.searchsorted(p[order], np.arange(n_parts + 1))
    out = tuple(
        pa.table({"src": dst_s[bounds[k]: bounds[k + 1]],
                  "label": lab_s[bounds[k]: bounds[k + 1]]},
                 schema=_LABEL_SCHEMA)
        for k in range(n_parts))
    return out if n_parts > 1 else out[0]


@ray.remote(num_returns=2)
def _cc_merge(part, *offer_slices: pa.Table):
    """Fold a round's offers into one partition's labels (vectorized
    per-node min) and report how many labels changed — the exact
    all-zero fixpoint signal. Returns ((edges, new_labels), n_changed);
    edges pass through untouched so the next round reuses one ref."""
    edges, labels = part
    l_src = labels.column("src").to_numpy(zero_copy_only=False)
    l_lab = labels.column("label").to_numpy(zero_copy_only=False).copy()
    live = [o for o in offer_slices if o is not None and o.num_rows]
    if not live or len(l_src) == 0:
        return (edges, labels), 0
    o = pa.concat_tables(live)
    o_dst = o.column("src").to_numpy(zero_copy_only=False)
    o_lab = o.column("label").to_numpy(zero_copy_only=False)
    idx = np.searchsorted(l_src, o_dst)          # offers' dst ⊂ l_src
    np.minimum.at(l_lab, idx, o_lab)
    changed = int((l_lab
                   < labels.column("label").to_numpy(zero_copy_only=False)
                   ).sum())
    new_labels = pa.table({"src": l_src, "label": l_lab},
                          schema=_LABEL_SCHEMA)
    return (edges, new_labels), changed


@ray.remote
def _cc_labels_of(part) -> pa.Table:
    return part[1]


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
    # size the partition count to the GRAPH, not the default: every
    # round pays 2 x num_partitions tasks of fixed overhead, and dup
    # graphs are usually tiny next to the corpus
    n_parts = min(num_partitions, max(1, n_edges // 8192 + 1))

    # ---- static co-partitioning (once): edges by hash(src), labels
    # derived per partition (unique srcs, label = src), both sorted
    refs = _coalesce_tiny(edges).to_arrow_refs()
    splits = [_cc_split_edges.options(num_returns=n_parts)
              .remote(r, n_parts) for r in refs]
    if n_parts == 1:
        splits = [[s] for s in splits]
    parts = [_cc_build_part.remote(*[sp[k] for sp in splits])
             for k in range(n_parts)]

    # ---- propagation rounds: offers exchange + local min fold; the
    # driver touches only refs and per-partition changed-counts
    for _ in range(max_iters):
        _rt0 = _time.perf_counter()
        offers = [_cc_offers.options(num_returns=n_parts)
                  .remote(p, n_parts) for p in parts]
        if n_parts == 1:
            offers = [[o] for o in offers]
        merged = [_cc_merge.remote(parts[k], *[o[k] for o in offers])
                  for k in range(n_parts)]
        parts = [m[0] for m in merged]
        changed = sum(ray.get([m[1] for m in merged]))
        if round_times is not None:
            round_times.append(round(_time.perf_counter() - _rt0, 3))
        if changed == 0:             # labels are monotone non-increasing:
            break                    # no change anywhere == fixpoint
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "(component diameter exceeds max_iters)")

    labels = rd.from_arrow_refs(
        [_cc_labels_of.remote(p) for p in parts])
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
