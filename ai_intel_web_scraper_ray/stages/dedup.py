"""Distributed deduplication stages.

Three levels, mirroring the reference pipeline order
(reference: competitive-intel/processors/deduplicator.py:37-70):

1. exact URL dedup   — shuffle key ``url.rstrip('/').lower()``, keep the row
   with the smallest ``arrival_seq`` (the reference's keep-first-in-list-order,
   deduplicator.py:72-81).  A per-batch combiner drops within-batch losers
   before the shuffle so the groupby moves one row per (key, batch) at most.
2. GitHub id dedup   — shuffle key ``{origin}-issue|discussion-{number}``;
   non-GitHub rows bypass the shuffle entirely (deduplicator.py:83-103).
3. MinHash near-dup  — signature map_batches → LSH band explode →
   groupby(band) verified candidate edges → greedy keep-first replay in
   arrival_seq order per connected component (deduplicator.py:105-146; the
   greedy pass is deliberately NOT transitive-closure dedup, see
   SURVEY.md §7.5).

Scale notes: the verified candidate-edge graph is sparse by construction
(edges require estimated Jaccard ≥ 0.7), so the greedy resolution runs on the
driver over O(E) edges; everything upstream is partition-parallel.  Above
100k rows the MinHash path runs two-pass: bare 8-byte band values shuffle
first to find multi-member bands, then signatures ship only for that sliver
(~256 B/doc instead of ~32 KiB/doc); exact URL/GitHub/text dedup shuffle
only (key, seq) projections and apply losing seqs back as drop filters —
collected + broadcast while small, remote-assembled plasma sorted arrays
above 1M losers (``_drop_by_seq_ds``), so even a mostly-duplicate corpus
never builds O(#duplicates) driver state and document bodies never move
through any dedup shuffle.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import minhash as mh

# ---------------------------------------------------------------------------
# 1. exact URL dedup
# ---------------------------------------------------------------------------


_N_KEY_BUCKETS = 1024


def _bucketed_losers(proj_ds, key_col: str, seq_col: str):
    """(key, seq) projection Dataset → losing-seq Dataset.

    Shuffles on hash(key) % 1024 instead of the raw key: a groupby over
    the raw key invokes the per-group Python callback once per DISTINCT
    key (≈ once per row for mostly-unique corpora); bucketing bounds the
    callback count at 1024 and resolves every key inside a bucket in one
    vectorized pass.  The bucket hash is polars' seeded vectorized hash
    straight over the Arrow column (the minhash-shingle primitive) —
    deterministic within an install, so re-executed tasks route
    identically, and ~10× cheaper than pandas' per-object hash_array."""
    def to_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)
        return t.append_column(
            "_kb", pa.array((h % _N_KEY_BUCKETS).astype("int64"),
                            pa.int64()))

    def bucket_losers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        out = df.loc[df[key_col].duplicated(keep="first"), [seq_col]]
        return out.astype({seq_col: "int64"})

    return (
        proj_ds.map_batches(to_bucket, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(bucket_losers, batch_format="pandas")
    )


def _drop_by_seq(ds, loser_seqs, seq_col: str):
    if not len(loser_seqs):
        return ds
    value_set = pa.array(sorted(int(s) for s in loser_seqs), pa.int64())

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[seq_col], value_set=value_set)))

    return ds.map_batches(drop, batch_format="pyarrow")


# above this many losing seqs the drop filter is never collected to the
# driver: the loser Dataset's blocks assemble into ONE sorted int64 array
# inside a remote task (driver holds only the ObjectRef) and filter tasks
# run a zero-copy plasma searchsorted — a 50%-duplicate 100-TB corpus
# stays bounded by plasma, not driver heap (VERDICT r2 §wrong-2)
_SEQ_DROP_BROADCAST_MAX = 1_000_000


def _drop_by_seq_ds(ds, losers_ds, seq_col: str,
                    broadcast_max: int = _SEQ_DROP_BROADCAST_MAX):
    """Apply a losing-seq Dataset (one int64 column ``seq_col``) as a drop
    filter over ``ds`` without unbounded driver state.

    ≤ ``broadcast_max`` losers: collected and applied via the
    :func:`_drop_by_seq` ``pc.is_in`` broadcast (cheapest when small).
    Above: the loser blocks concatenate into a SORTED int64 numpy array
    inside a remote task — the driver only ever holds the ObjectRef, and
    each filter task mmaps the array zero-copy from plasma and runs a
    vectorized ``searchsorted`` anti-membership test (the `_apply_drop`
    plasma contract, minus the hash layer since seqs are already int64).
    Rows of ``ds`` never shuffle on either path."""
    import ray

    losers_ds = losers_ds.materialize()
    n_losers = losers_ds.count()
    if n_losers == 0:
        return ds
    if n_losers <= broadcast_max:
        losers = losers_ds.to_pandas()
        if seq_col not in losers.columns:
            return ds
        return _drop_by_seq(ds, losers[seq_col].tolist(), seq_col)

    @ray.remote
    def assemble(*tables) -> np.ndarray:
        # varargs so Ray resolves each block ref; blocks may be Arrow or
        # pandas depending on the upstream operator
        import pyarrow as _pa
        tables = [t if isinstance(t, _pa.Table) else _pa.Table.from_pandas(t)
                  for t in tables]
        seqs = _pa.concat_tables(
            [t.select([seq_col]) for t in tables])[seq_col]
        return np.unique(seqs.to_numpy(zero_copy_only=False).astype("int64"))

    loser_ref = assemble.remote(*losers_ds.to_arrow_refs())

    def drop(t: pa.Table) -> pa.Table:
        arr = ray.get(loser_ref)  # zero-copy plasma mmap per node
        v = t[seq_col].to_numpy(zero_copy_only=False).astype("int64")
        pos = np.searchsorted(arr, v)
        pos[pos >= len(arr)] = len(arr) - 1
        keep = arr[pos] != v
        return t.filter(pa.array(keep))

    return ds.map_batches(drop, batch_format="pyarrow")


def exact_url_dedup(ds, url_col: str = "url", seq_col: str = "arrival_seq",
                    materialize_input: bool = True,
                    drop_broadcast_max: int = _SEQ_DROP_BROADCAST_MAX):
    """Keep the first-arrived row per canonical URL key.

    Scale shape: only the (key, seq) PROJECTION shuffles (tens of bytes per
    row instead of the full multi-KB document rows); the grouped pass emits
    just the losing seqs, applied back as a drop filter via
    :func:`_drop_by_seq_ds` — collected and ``pc.is_in``-broadcast while
    small, kept in plasma as a remote-assembled sorted array above
    ``drop_broadcast_max`` so even a mostly-duplicate corpus never builds
    O(#duplicates) driver state."""
    if materialize_input:
        ds = ds.materialize()

    def project(t: pa.Table) -> pa.Table:
        # full projection, no within-batch combine: a local combine would
        # swallow within-batch losers before they can be reported
        key = pc.utf8_lower(pc.utf8_rtrim(t[url_col], "/"))
        return pa.table({"_dedup_key": key, seq_col: pc.cast(t[seq_col], pa.int64())})

    losers_ds = _bucketed_losers(
        ds.map_batches(project, batch_format="pyarrow"), "_dedup_key", seq_col
    )
    return _drop_by_seq_ds(ds, losers_ds, seq_col,
                           broadcast_max=drop_broadcast_max)


# ---------------------------------------------------------------------------
# 2. GitHub id dedup
# ---------------------------------------------------------------------------

GITHUB_TYPES = ("github_issue", "github_discussion")


def github_id_dedup(ds, seq_col: str = "arrival_seq", materialize_input: bool = True,
                    drop_broadcast_max: int = _SEQ_DROP_BROADCAST_MAX):
    """Dedup GitHub issues/discussions on (origin, kind, number).

    Scale shape: only GitHub rows' (key, seq) projection shuffles; losing
    seqs come back as a drop filter via :func:`_drop_by_seq_ds`
    (broadcast while small, plasma-sorted-array above the ceiling).
    Non-GitHub rows never move (deduplicator.py:83-103 passthrough
    semantics)."""

    def project(t: pa.Table) -> pa.Table:
        # only GitHub rows enter the projection shuffle; everything else
        # has no key and cannot lose
        stypes = t["source_type"].to_pylist()
        origins = t["origin"].to_pylist()
        metas = t["metadata"].to_pylist() if "metadata" in t.schema.names else [{}] * len(t)
        seqs = t[seq_col].to_pylist()
        keys, out_seqs = [], []
        for st, origin, meta, seq in zip(stypes, origins, metas, seqs):
            meta = meta or {}
            if st == "github_issue":
                keys.append(f"{origin}-issue-{meta.get('issue_number', '')}")
            elif st == "github_discussion":
                keys.append(f"{origin}-discussion-{meta.get('discussion_number', '')}")
            else:
                continue
            out_seqs.append(seq)
        return pa.table({"_gh_key": pa.array(keys, pa.string()),
                         seq_col: pa.array(out_seqs, pa.int64())})

    if materialize_input:
        ds = ds.materialize()
    losers_ds = _bucketed_losers(
        ds.map_batches(project, batch_format="pyarrow"), "_gh_key", seq_col
    )
    return _drop_by_seq_ds(ds, losers_ds, seq_col,
                           broadcast_max=drop_broadcast_max)


# ---------------------------------------------------------------------------
# 3. MinHash LSH near-dup
# ---------------------------------------------------------------------------


def greedy_resolve(edges: Sequence[Tuple[int, int]], seqs: Dict[str, int] = None) -> Set:
    """Replay the reference's sequential keep-first pass over a candidate
    graph.

    ``edges`` are (a, b) pairs of node keys; order within a pair is
    irrelevant.  Nodes are compared by their sort key (arrival_seq); pass
    ``seqs`` to map node-id → seq, else node keys must sort like seqs.
    Returns the set of dropped nodes.  A node is dropped iff some *kept*
    neighbor has a smaller seq — processed in ascending seq order, exactly
    the LSH query-then-insert loop of deduplicator.py:122-144.
    """
    adj = defaultdict(set)
    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
        nodes.add(a)
        nodes.add(b)
    keyf = (lambda n: seqs[n]) if seqs else (lambda n: n)
    dropped: Set = set()
    kept: Set = set()
    for node in sorted(nodes, key=keyf):
        if any(nb in kept for nb in adj[node]):
            dropped.add(node)
        else:
            kept.add(node)
    return dropped



def label_components(edges_ds, max_iters: int = 50):
    """Connected components by min-label propagation — the reusable
    iterative-graph core of :func:`greedy_resolve_distributed`, also
    driven directly by the public ``parts_components`` query.

    ``edges_ds``: Dataset with columns (a_id, b_id, a_seq, b_seq) where
    ``seq`` is each endpoint's initial integer label (dedup uses arrival
    seqs; generic graphs pass the node id itself).  Every node starts
    with its own label; each round every edge endpoint takes the min of
    the two labels (two hash joins + a bucketed groupby-min per round);
    the label SUM is a strictly decreasing potential, so an unchanged
    sum detects the fixpoint without an anti-join.  Converges in
    O(component diameter) rounds.

    Returns ``(labels, edges_materialized, npart)`` — labels is a
    Dataset with columns (id, label) giving each node its component's
    minimum seq."""
    import ray.data as rd  # noqa: F401  (kept for parity with callers)

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    # hash-join partitions sized to the edge count: tiny graphs get 1
    # partition (empty hash partitions lose their schema and break the
    # downstream pyarrow join); big graphs get real parallelism
    npart = max(1, min(32, n_edges // 10_000 + 1))

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        a = df[["a_id", "a_seq"]].rename(columns={"a_id": "id", "a_seq": "seq"})
        b = df[["b_id", "b_seq"]].rename(columns={"b_id": "id", "b_seq": "seq"})
        return pd.concat([a, b], ignore_index=True).drop_duplicates("id")

    # pin the id dtype from the edge schema — callers use string ids
    # (urls) OR int64 ids (doc_ids); forcing pa.string() crashed the
    # integer-id paths the moment distributed resolve engaged
    schema = edges_ds.schema()
    id_type = schema.types[schema.names.index("a_id")]
    if not isinstance(id_type, pa.DataType):
        id_type = pa.string()

    def canon(df: pd.DataFrame) -> pa.Table:
        """Pin the (id, label) schema even for empty blocks, so no
        schemaless empty block ever reaches a join input."""
        src = df["label"] if "label" in df.columns else df.get("min(seq)", df.get("min(label)"))
        return pa.table({
            "id": pa.array(list(df["id"]) if "id" in df.columns else [], id_type),
            "label": pa.array([int(x) for x in src] if src is not None else [], pa.int64()),
        })

    # per-id minima run under a bounded 64-way id-hash bucket (one
    # vectorized pandas groupby per bucket) — Ray's sort-based Aggregate
    # on the per-node key space is ~8× slower at the same exchange volume
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ids = df["id"]
        if pd.api.types.is_integer_dtype(ids):
            b = ids.astype("int64") % 64
        else:
            # process-stable (fixed-key) hash — NOT Python hash()
            b = pd.util.hash_pandas_object(ids, index=False) % 64
        df["_b"] = b.astype("int64")
        return df

    def bucket_min(col: str):
        def fn(df: pd.DataFrame) -> pa.Table:
            out = df.groupby("id", as_index=False)[col].min()
            out = out.rename(columns={col: "label"})
            return canon(out)

        return fn

    labels = (
        edges_ds.map_batches(to_nodes, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_b").map_groups(bucket_min("seq"), batch_format="pandas")
        .materialize()
    )
    label_sum = labels.sum("label")

    for _ in range(max_iters):
        ea = edges_ds.select_columns(["a_id", "b_id"]).join(
            labels, join_type="inner", num_partitions=npart,
            on=("a_id",), right_on=("id",),
        )  # (a_id, b_id, label)  — label of a

        def msgs(df: pd.DataFrame) -> pa.Table:
            # each edge sends a's label to b (propagation is symmetric over
            # rounds: b's label flows back through b's own edges next round);
            # arrow output keeps every block type uniform for the union
            return pa.table({"id": pa.array(list(df["b_id"]), id_type),
                             "label": pa.array(list(df["label"]), pa.int64())})

        prop = ea.map_batches(msgs, batch_format="pandas")
        eb = edges_ds.select_columns(["a_id", "b_id"]).join(
            labels, join_type="inner", num_partitions=npart,
            on=("b_id",), right_on=("id",),
        )

        def msgs_rev(df: pd.DataFrame) -> pa.Table:
            return pa.table({"id": pa.array(list(df["a_id"]), id_type),
                             "label": pa.array(list(df["label"]), pa.int64())})

        prop_rev = eb.map_batches(msgs_rev, batch_format="pandas")
        new_labels = (
            labels.union(prop).union(prop_rev)
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("_b").map_groups(bucket_min("label"),
                                      batch_format="pandas")
            .materialize()
        )
        # Convergence check without a join (anti-joins choke on the empty
        # schemaless blocks tiny partitions produce): labels only ever
        # DECREASE under min-propagation, so the label sum is a strictly
        # decreasing potential — unchanged sum ⇔ fixpoint.
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == label_sum:
            break
        label_sum = new_sum
    else:
        # non-convergence must be VISIBLE: a component chain longer than
        # max_iters hops would be left split across labels and the split
        # shards under-deduplicate independently
        import warnings

        warnings.warn(
            f"greedy_resolve_distributed: label propagation did not "
            f"converge in {max_iters} rounds — components with diameter "
            f"> {max_iters} are split and may under-deduplicate; raise "
            f"max_iters",
            RuntimeWarning,
        )
    return labels, edges_ds, npart


def greedy_resolve_distributed(edges_ds, max_iters: int = 50):
    """Distributed replay of :func:`greedy_resolve` for edge sets too large
    for the driver (NOTES_r1 #4: the driver pass is O(E) memory — at 10⁹
    docs with a 10 % dup rate the edge list alone is ~10 GB).

    ``edges_ds``: Dataset with columns (a_id, b_id, a_seq, b_seq).
    Returns a Dataset with column ``dropped_id``.

    Two phases, both partition-parallel:

    1. connected components via :func:`label_components` (min-seq label
       propagation; near-dup components are cliques/short chains, so a
       handful of rounds);
    2. ``groupby(component).map_groups`` — the order-sensitive sequential
       greedy runs inside each component, which is a single near-dup
       cluster (tiny), so the per-group Python cost is bounded by cluster
       size, never corpus size.
    """
    import ray.data as rd

    labels, edges_ds, npart = label_components(edges_ds, max_iters)

    # phase 2: per-component sequential greedy (components are clusters)
    comp_edges = edges_ds.join(
        labels, join_type="inner", num_partitions=npart,
        on=("a_id",), right_on=("id",),
    )

    # One Python callback per label-hash BUCKET, not per component: the
    # greedy replay over a union of DISJOINT components equals the
    # per-component replays (nodes of different components never share an
    # edge), so running greedy_resolve once over a whole bucket is exact
    # while bounding the callback count at _N_KEY_BUCKETS.
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = (df["label"].astype("int64") % _N_KEY_BUCKETS).astype("int64")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        seqs: Dict = {}
        pairs: List[Tuple] = []
        for a, b, sa, sb in g[["a_id", "b_id", "a_seq", "b_seq"]].itertuples(index=False):
            seqs[a] = int(sa)
            seqs[b] = int(sb)
            pairs.append((a, b))
        dropped = greedy_resolve(pairs, seqs)
        return pd.DataFrame({"dropped_id": sorted(dropped)})

    out = (
        comp_edges.map_batches(bucketize, batch_format="pandas")
        .groupby("_cb").map_groups(per_bucket, batch_format="pandas")
        .materialize()   # count() below must not re-run phase 2 for the caller
    )
    if out.count() == 0:
        return rd.from_items([])
    return out


# above this many dropped ids, the drop filter stays a DATASET and is
# applied via a plasma-shared sorted id array (see _apply_drop) — funnelling
# the ids through a driver set + pc.is_in broadcast would rebuild the
# O(#duplicates) driver structure the distributed resolver exists to avoid
_DROP_BROADCAST_MAX = 1_000_000


def _resolve_edges(edges_ds, distributed_resolve: Optional[bool]):
    """Shared tail of every near-dup path: candidate-edge Dataset →
    dropped ids, via the driver greedy (small edge sets) or the
    distributed per-component replay (auto above 2M edges).

    Returns a ``set`` when the dropped ids are broadcastable, else a
    materialized Dataset with column ``dropped_id`` (feed to
    :func:`_apply_drop`)."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return set()
    if distributed_resolve is None:
        distributed_resolve = n_edges > 2_000_000
    if distributed_resolve:
        dedup_edges = edges_ds.map_batches(
            lambda df: df.drop_duplicates(["a_id", "b_id"]), batch_format="pandas"
        )
        dropped_ds = greedy_resolve_distributed(dedup_edges)
        n_dropped = dropped_ds.count()
        if n_dropped == 0:
            return set()
        if n_dropped > _DROP_BROADCAST_MAX:
            return dropped_ds
        dropped_df = dropped_ds.to_pandas()
        if "dropped_id" not in dropped_df.columns:
            return set()
        return set(dropped_df["dropped_id"])
    edges_df = edges_ds.to_pandas().drop_duplicates(["a_id", "b_id"])
    seqs: Dict = {}
    pairs: List[Tuple] = []
    for a, b, sa, sb in edges_df[["a_id", "b_id", "a_seq", "b_seq"]].itertuples(index=False):
        seqs[a] = int(sa)
        seqs[b] = int(sb)
        pairs.append((a, b))
    return greedy_resolve(pairs, seqs)


_DROP_HASH_SEED = 7


def _hash_ids_u64(col) -> np.ndarray:
    """Deterministic vectorized uint64 hash of an id column (polars seeded
    hash — the same primitive minhash shingling relies on).  Null ids hash
    to SOME value but callers must mask them with a validity mask."""
    import polars as pl

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.from_arrow(col).hash(seed=_DROP_HASH_SEED).to_numpy().astype(np.uint64)


def _apply_drop(ds, id_col: str, dropped):
    """Drop rows whose ``id_col`` is in ``dropped`` → (ds, n_dropped).

    Anti-join semantics throughout: rows with a NULL id never match and are
    always kept.

    ``dropped`` is a set (small → broadcast ``pc.is_in`` filter, rows never
    shuffle) or a Dataset['dropped_id'] (large).  The large path assembles,
    inside a remote task (the driver only ever holds the ObjectRef), a
    SORTED uint64 hash array of the dropped ids plus the ids themselves
    ordered by hash.  Both are zero-copy from plasma — the hash array is a
    numeric numpy array and the ids ride in an Arrow table — so filter
    tasks pay one mmap per node, never a per-task unpickle (a numpy OBJECT
    array of string ids would be pickled; Ray only zero-copies numeric
    buffers).  Membership is a vectorized ``np.searchsorted`` on the hash
    plus an exact id compare on the (rare) hash hits, so the filter is
    exact, not probabilistic.  Rows never shuffle on either path.  (A hash
    LEFT-ANTI ``Dataset.join`` was tried first, but Ray's Acero join
    rejects list/struct non-key columns, which real document rows carry.)
    Scale bound: hashes + ids are one plasma copy per node — ~8 GB + id
    bytes at 10⁹ dropped ids; beyond that, partition the drop filter by
    hash range."""
    import ray

    if isinstance(dropped, set):
        if not dropped:
            return ds, 0
        value_set = pa.array(sorted(dropped))

        def drop_rows(t: pa.Table) -> pa.Table:
            # pc.is_in yields False for null ids → invert keeps them
            mask = pc.is_in(t[id_col], value_set=value_set)
            return t.filter(pc.invert(mask))

        return ds.map_batches(drop_rows, batch_format="pyarrow"), len(dropped)

    n_dropped = dropped.count()
    if n_dropped == 0:
        return ds, 0

    @ray.remote
    def assemble(*block_refs):
        chunks = [b["dropped_id"].combine_chunks() for b in block_refs]
        ids = pa.concat_arrays([c.drop_null() for c in chunks])
        h = _hash_ids_u64(ids)
        order = np.argsort(h, kind="stable")
        return (np.ascontiguousarray(h[order]),
                pa.table({"id": ids.take(pa.array(order))}))

    ref = assemble.remote(*list(dropped.to_arrow_refs()))

    def drop_rows_sorted(t: pa.Table) -> pa.Table:
        hashes, ids_tbl = ray.get(ref)     # zero-copy from plasma
        col = t[id_col]
        bh = _hash_ids_u64(col)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(hashes, bh, side="left")
        clamped = np.minimum(lo, len(hashes) - 1)
        cand = (hashes[clamped] == bh) & valid
        drop = np.zeros(len(t), dtype=bool)
        cand_idx = np.nonzero(cand)[0]
        if len(cand_idx):
            sorted_ids = ids_tbl["id"].combine_chunks()
            cand_ids = col.combine_chunks().take(pa.array(cand_idx))
            # exact verify: compare each candidate to the FIRST dropped id
            # sharing its hash (vectorized); hash collisions among dropped
            # ids are ~m²/2⁶⁴, so the >1-span loop below almost never runs
            first = sorted_ids.take(pa.array(lo[cand_idx]))
            eq = pc.equal(cand_ids, first).to_numpy(zero_copy_only=False)
            drop[cand_idx[eq]] = True
            unresolved = np.nonzero(~eq)[0]
            if len(unresolved):
                hi = np.searchsorted(hashes, bh[cand_idx[unresolved]],
                                     side="right")
                for j, end in zip(unresolved, hi):
                    row = cand_idx[j]
                    target = cand_ids[j].as_py()
                    for k in range(lo[row] + 1, end):
                        if sorted_ids[k].as_py() == target:
                            drop[row] = True
                            break
        return t.filter(pa.array(~drop))

    return ds.map_batches(drop_rows_sorted, batch_format="pyarrow"), n_dropped


def _sig_matrix(col) -> np.ndarray:
    """FixedSizeList<uint64> column → (n, NUM_PERM) matrix, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, mh.NUM_PERM)


def minhash_dedup(
    ds,
    id_col: str = "id",
    text_col: str = "text",
    seq_col: str = "arrival_seq",
    threshold: float = mh.DEFAULT_THRESHOLD,
    materialize_input: bool = True,
    two_pass: bool = None,
    distributed_resolve: bool = None,
    _edges_only: bool = False,
):
    """Drop near-duplicate rows (estimated Jaccard ≥ threshold), keeping the
    first arrival of each near-dup cluster per the greedy reference
    semantics.  Returns (deduped_ds, n_dropped).

    ``distributed_resolve``: run the greedy replay per connected component
    via :func:`greedy_resolve_distributed` instead of the driver O(E) pass;
    default auto-switches above 2 M candidate edges.

    Two passes read the input (edge discovery, then the drop filter), so by
    default the input is materialized once in the object store instead of
    re-executing the upstream chain twice.  At 100-TB scale, persist the
    upstream stage to partitioned parquet and pass that read in with
    ``materialize_input=False`` — same two-pass structure, storage-backed
    (the reference's stage-file pattern, RUNBOOK.md:43)."""
    if materialize_input:
        ds = ds.materialize()

    # Coarse shuffle buckets: groupby on the raw band value would invoke the
    # per-group Python callback once per distinct band hash (≈ rows × 32) —
    # catastrophically chatty.  Instead shuffle on band % NUM_BUCKETS and
    # resolve the per-band grouping vectorized inside each bucket.
    NUM_BUCKETS = 64
    MAX_GROUP = 256  # degenerate-band guard (e.g. thousands of empty docs)

    # Pass 0: signatures once, pinned (1 KiB/row — the expensive compute).
    def to_sigs(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t[text_col].to_pylist()]
        sigs = mh.signatures_batch(texts)          # (n, 128) uint64
        return pa.table(
            {
                id_col: t[id_col],
                seq_col: pc.cast(t[seq_col], pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), mh.NUM_PERM
                ),
            }
        )

    sig_ds = ds.map_batches(to_sigs, batch_format="pyarrow").materialize()

    # Adaptive pass structure: shipping every band row with its 1 KiB
    # signature costs ~32 KiB/doc of shuffle; above a size cutoff it is
    # cheaper to first shuffle BARE band values (8 bytes/row) to find
    # multi-member bands, then ship signatures only for that sliver.
    # two-pass wins as soon as the corpus isn't tiny: shipping bare 8-byte
    # bands first costs one cheap 64-bucket shuffle and cuts the signature
    # shuffle to the multi-band sliver (measured 5.3 s vs 17.3 s one-pass at
    # sf0.1 after the partial-count fix)
    if two_pass is None:
        two_pass = sig_ds.count() > 2_000

    multi_set = None
    if two_pass:
        # Find multi-member bands WITHOUT a high-cardinality groupby: a
        # groupby("band") over ~rows×32 mostly-distinct keys invokes Ray's
        # per-key aggregate machinery per band (measured 33 s for 153k
        # distinct keys at sf0.1).  Instead: per-batch partial counts
        # (np.unique), shuffle on band%NUM_BUCKETS (64 keys), vectorized
        # pandas merge per bucket.  Only the multi-band values (the
        # near-dup sliver) reach the driver.
        def to_band_partial(t: pa.Table) -> pa.Table:
            sigs = _sig_matrix(t["sig"])
            bands = mh.band_hashes(sigs).reshape(-1)
            u, c = np.unique(bands, return_counts=True)
            return pa.table({
                "band": pa.array(u, pa.uint64()),
                "n": pa.array(c, pa.int64()),
                "bucket": pa.array((u % NUM_BUCKETS).astype(np.int64), pa.int64()),
            })

        def bucket_multi(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("band", sort=False)["n"].sum()
            return pd.DataFrame({"band": g[g > 1].index.to_numpy()})

        multi_df = (
            sig_ds.map_batches(to_band_partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_multi, batch_format="pandas")
            .to_pandas()
        )
        if not len(multi_df) or "band" not in multi_df.columns:
            return ds, 0
        multi_set = pa.array(multi_df["band"].to_numpy().astype(np.uint64), pa.uint64())

    # Pass 2: ship signatures ONLY for rows having at least one multi-member
    # band, and only those band rows — the near-dup candidate sliver.
    def to_bands(t: pa.Table) -> pa.Table:
        sigs = _sig_matrix(t["sig"])
        bands = mh.band_hashes(sigs)               # (n, 32) uint64
        nb = mh.LSH_BANDS
        flat = bands.reshape(-1)
        if multi_set is not None:
            keep = pc.is_in(pa.array(flat, pa.uint64()), value_set=multi_set).to_numpy(
                zero_copy_only=False
            )
        else:
            keep = np.ones(len(flat), dtype=bool)
        if not keep.any():
            return pa.table({
                "band": pa.array([], pa.uint64()),
                "bucket": pa.array([], pa.int64()),
                id_col: pa.array([], t[id_col].type),
                seq_col: pa.array([], pa.int64()),
                "sig": pa.array([], pa.list_(pa.uint64())),
            })
        ids = np.repeat(t[id_col].to_pylist(), nb)[keep]
        seqs = np.repeat(t[seq_col].to_numpy(zero_copy_only=False), nb)[keep]
        row_idx = np.repeat(np.arange(len(t)), nb)[keep]
        kept_bands = flat[keep]
        return pa.table(
            {
                "band": pa.array(kept_bands, pa.uint64()),
                "bucket": pa.array((kept_bands % NUM_BUCKETS).astype(np.int64), pa.int64()),
                id_col: pa.array(ids),
                seq_col: pa.array(seqs, pa.int64()),
                "sig": pa.array([sigs[i].tolist() for i in row_idx], pa.list_(pa.uint64())),
            }
        )

    def bucket_edges(bucket: pd.DataFrame) -> pd.DataFrame:
        """All verified candidate edges within one coarse bucket: pandas
        C-level grouping by band, numpy pairwise verification per
        multi-member band."""
        empty = pd.DataFrame({"a_id": [], "b_id": [], "a_seq": [], "b_seq": []})
        if len(bucket) < 2:
            return empty
        counts = bucket["band"].value_counts()
        multi = counts[counts > 1].index
        if len(multi) == 0:
            return empty
        rows = []
        for band_val, g in bucket[bucket["band"].isin(multi)].groupby("band", sort=False):
            g = g.sort_values(seq_col, kind="stable").drop_duplicates(id_col)
            if len(g) < 2:
                continue
            # Cap the quadratic blowup on degenerate bands: the earliest
            # MAX_GROUP arrivals pair among themselves; every row beyond the
            # cap pairs against that retained slice only (near-dup bands are
            # cliques in practice, so the earliest kept member catches each
            # tail row).  Total work is O(m · MAX_GROUP), not O(m²), and no
            # row is silently skipped.
            head, tail = g.iloc[:MAX_GROUP], g.iloc[MAX_GROUP:]
            hsigs = np.stack([np.asarray(s, dtype=np.uint64) for s in head["sig"]])
            hids = head[id_col].to_numpy()
            hseqs = head[seq_col].to_numpy()
            for i in range(len(head) - 1):
                agree = (hsigs[i + 1 :] == hsigs[i]).mean(axis=1)
                for off in np.nonzero(agree >= threshold)[0]:
                    j = i + 1 + off
                    rows.append((hids[i], hids[j], hseqs[i], hseqs[j]))
            if len(tail):
                tids = tail[id_col].to_numpy()
                tseqs = tail[seq_col].to_numpy()
                tsigs = np.stack([np.asarray(s, dtype=np.uint64) for s in tail["sig"]])
                for lo in range(0, len(tail), 512):  # bound broadcast memory
                    chunk = tsigs[lo : lo + 512]
                    agree = (chunk[:, None, :] == hsigs[None, :, :]).mean(axis=2)
                    ti, hi = np.nonzero(agree >= threshold)
                    for a, b in zip(ti, hi):
                        rows.append((hids[b], tids[lo + a], hseqs[b], tseqs[lo + a]))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a_id", "b_id", "a_seq", "b_seq"])

    bands = sig_ds.map_batches(to_bands, batch_format="pyarrow")
    edges_ds = bands.groupby("bucket").map_groups(bucket_edges, batch_format="pandas")
    if _edges_only:
        # ensemble composition hook: hand the verified candidate edges to
        # a caller that merges several methods under ONE greedy resolve
        return edges_ds
    dropped = _resolve_edges(edges_ds, distributed_resolve)
    return _apply_drop(ds, id_col, dropped)


# ---------------------------------------------------------------------------
# Generic exact text dedup (training-data addition): hash-partition on a
# content hash, keep first by a sort key.  SQL-oracle-friendly.
# ---------------------------------------------------------------------------


def exact_text_dedup(ds, text_col: str = "text", order_col: str = "doc_id",
                     materialize_input: bool = True,
                     drop_broadcast_max: int = _SEQ_DROP_BROADCAST_MAX):
    """Exact content dedup: shuffle only (sha256(text), order) projections;
    losing orders come back as a drop filter via :func:`_drop_by_seq_ds`
    (broadcast while small, plasma-sorted-array above the ceiling) —
    document bodies never move through the shuffle."""
    import hashlib

    if materialize_input:
        ds = ds.materialize()

    def project(t: pa.Table) -> pa.Table:
        hashes = [hashlib.sha256((x or "").encode()).hexdigest()
                  for x in t[text_col].to_pylist()]
        return pa.table({"_text_hash": pa.array(hashes, pa.string()),
                         order_col: pc.cast(t[order_col], pa.int64())})

    losers_ds = _bucketed_losers(
        ds.map_batches(project, batch_format="pyarrow"), "_text_hash", order_col
    )
    return _drop_by_seq_ds(ds, losers_ds, order_col,
                           broadcast_max=drop_broadcast_max)


# ---------------------------------------------------------------------------
# n-gram-Jaccard-verified near-dup (training-data addition): MinHash-LSH
# candidate generation, but verification on the EXACT shingle Jaccard
# instead of the signature estimate.
# ---------------------------------------------------------------------------


def ngram_jaccard_dedup(
    ds,
    id_col: str = "id",
    text_col: str = "text",
    seq_col: str = "arrival_seq",
    threshold: float = 0.7,
    materialize_input: bool = True,
    distributed_resolve: bool = None,
):
    """Like minhash_dedup, but candidate pairs are verified with the exact
    word-3-shingle Jaccard (texts shipped into the band groupby alongside
    signatures).  Higher precision, higher shuffle volume — choose per
    corpus.  Returns (deduped_ds, n_dropped)."""
    if materialize_input:
        ds = ds.materialize()
    NUM_BUCKETS = 64
    MAX_GROUP = 256

    def to_bands(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t[text_col].to_pylist()]
        sigs = mh.signatures_batch(texts)
        bands = mh.band_hashes(sigs)
        nb = mh.LSH_BANDS
        flat = bands.reshape(-1)
        return pa.table(
            {
                "band": pa.array(flat, pa.uint64()),
                "bucket": pa.array((flat % NUM_BUCKETS).astype(np.int64), pa.int64()),
                id_col: pa.array(np.repeat(t[id_col].to_pylist(), nb)),
                seq_col: pa.array(
                    np.repeat(t[seq_col].to_numpy(zero_copy_only=False), nb), pa.int64()
                ),
                "_text": pa.array(np.repeat(texts, nb)),
            }
        )

    def bucket_edges(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "a_seq": [], "b_seq": []})
        counts = bucket["band"].value_counts()
        multi = counts[counts > 1].index
        if len(multi) == 0:
            return empty
        rows = []
        for _, g in bucket[bucket["band"].isin(multi)].groupby("band", sort=False):
            g = g.sort_values(seq_col, kind="stable").drop_duplicates(id_col)
            if len(g) < 2:
                continue
            # same cap semantics as minhash_dedup: earliest MAX_GROUP pair
            # among themselves, each tail row pairs against that slice only
            # (O(m · MAX_GROUP) set intersections, no silent skips)
            shingle_sets = [set(mh.shingles(t)) for t in g["_text"]]
            ids = g[id_col].to_numpy()
            seqs = g[seq_col].to_numpy()

            def jac(sa, sb):
                if not sa and not sb:
                    return 1.0
                if not sa or not sb:
                    return 0.0
                return len(sa & sb) / len(sa | sb)

            hn = min(len(g), MAX_GROUP)
            for i in range(hn - 1):
                for j in range(i + 1, hn):
                    if jac(shingle_sets[i], shingle_sets[j]) >= threshold:
                        rows.append((ids[i], ids[j], seqs[i], seqs[j]))
            for j in range(hn, len(g)):
                for i in range(hn):
                    if jac(shingle_sets[i], shingle_sets[j]) >= threshold:
                        rows.append((ids[i], ids[j], seqs[i], seqs[j]))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a_id", "b_id", "a_seq", "b_seq"])

    bands = ds.map_batches(to_bands, batch_format="pyarrow")
    edges_ds = bands.groupby("bucket").map_groups(bucket_edges, batch_format="pandas")
    dropped = _resolve_edges(edges_ds, distributed_resolve)
    return _apply_drop(ds, id_col, dropped)


# ---------------------------------------------------------------------------
# SimHash near-dup (training-data addition): 64-bit SimHash, pigeonhole
# banding — hamming ≤ k implies at least one of k+1 equal-width chunks is
# identical, so groupby chunk value finds all candidates exactly.
# ---------------------------------------------------------------------------


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR), no Python-int round trip."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_dedup(
    ds,
    id_col: str = "id",
    text_col: str = "text",
    seq_col: str = "arrival_seq",
    max_hamming: int = 3,
    materialize_input: bool = True,
    distributed_resolve: bool = None,
    _edges_only: bool = False,
):
    """Near-dup rows with SimHash hamming distance ≤ max_hamming dropped
    (greedy keep-first).  Candidate recall is EXACT by the pigeonhole
    principle with max_hamming+1 chunks.  Returns (deduped_ds, n_dropped)."""
    from ..functions import simhash as sh

    if materialize_input:
        ds = ds.materialize()
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def to_chunks(t: pa.Table) -> pa.Table:
        vals = sh.simhash_batch([x or "" for x in t[text_col].to_pylist()])
        ids = t[id_col].to_pylist()
        seqs = t[seq_col].to_numpy(zero_copy_only=False)
        parts = []
        for c in range(n_chunks):
            chunk_val = (vals >> np.uint64(c * chunk_bits)) & np.uint64((1 << chunk_bits) - 1)
            # salt with the chunk index so chunk c values never collide with chunk c'
            key = chunk_val.astype(np.int64) * n_chunks + c
            parts.append(
                pa.table(
                    {
                        "chunk_key": pa.array(key, pa.int64()),
                        "bucket": pa.array(key % 64, pa.int64()),
                        id_col: pa.array(ids),
                        seq_col: pa.array(seqs, pa.int64()),
                        "_sim": pa.array(vals, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    def bucket_edges(bucket: pd.DataFrame) -> pd.DataFrame:
        # coarse bucket shuffle, per-chunk_key grouping vectorized inside
        empty = pd.DataFrame({"a_id": [], "b_id": [], "a_seq": [], "b_seq": []})
        counts = bucket["chunk_key"].value_counts()
        multi = counts[counts > 1].index
        if len(multi) == 0:
            return empty
        rows = []
        MAX_GROUP = 256
        for _, g in bucket[bucket["chunk_key"].isin(multi)].groupby("chunk_key", sort=False):
            g = g.sort_values(seq_col, kind="stable").drop_duplicates(id_col)
            if len(g) < 2:
                continue
            sims = g["_sim"].to_numpy().astype(np.uint64)
            ids = g[id_col].to_numpy()
            seqs = g[seq_col].to_numpy()
            # cap semantics match minhash_dedup: earliest MAX_GROUP pair
            # among themselves; tail rows pair against that slice only
            hn = min(len(g), MAX_GROUP)
            for i in range(hn - 1):
                x = sims[i] ^ sims[i + 1 : hn]
                ham = _popcount64(x)
                for off in np.nonzero(ham <= max_hamming)[0]:
                    j = i + 1 + off
                    rows.append((ids[i], ids[j], seqs[i], seqs[j]))
            if len(g) > hn:
                for j in range(hn, len(g)):
                    ham = _popcount64(sims[:hn] ^ sims[j])
                    for i in np.nonzero(ham <= max_hamming)[0]:
                        rows.append((ids[i], ids[j], seqs[i], seqs[j]))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a_id", "b_id", "a_seq", "b_seq"])

    chunks = ds.map_batches(to_chunks, batch_format="pyarrow")
    edges_ds = chunks.groupby("bucket").map_groups(bucket_edges, batch_format="pandas")
    if _edges_only:
        return edges_ds
    dropped = _resolve_edges(edges_ds, distributed_resolve)
    return _apply_drop(ds, id_col, dropped)


def ensemble_near_dedup(
    ds,
    id_col: str = "id",
    text_col: str = "text",
    seq_col: str = "arrival_seq",
    minhash_threshold: float = mh.DEFAULT_THRESHOLD,
    max_hamming: int = 3,
    materialize_input: bool = True,
    distributed_resolve: bool = None,
):
    """Ensemble near-dedup: the UNION of MinHash-LSH (verified) and
    SimHash (hamming ≤ ``max_hamming``) candidate edges resolved by ONE
    greedy keep-first pass.  Recall is ≥ either method alone, and
    resolving the union jointly collapses transitive chains that cross
    methods (A≈B by MinHash, B≈C by SimHash → one survivor), which two
    sequential dedups would miss when the first pass drops the bridge.

    Scale shape: both candidate paths are the existing banded exchanges
    (projections only, capped groups); the union is a block-level
    concat (no shuffle) canonicalized to one pinned Arrow schema so
    empty edge blocks from either path can't drop the union's schema;
    resolution reuses ``_resolve_edges`` (driver greedy below 2 M edges,
    per-component distributed replay above).  Returns
    ``(deduped_ds, n_dropped)``."""
    if materialize_input:
        ds = ds.materialize()
    e_min = minhash_dedup(ds, id_col, text_col, seq_col,
                          threshold=minhash_threshold,
                          materialize_input=False, _edges_only=True)
    e_sim = simhash_dedup(ds, id_col, text_col, seq_col,
                          max_hamming=max_hamming,
                          materialize_input=False, _edges_only=True)

    schema = ds.schema()
    id_type = schema.types[schema.names.index(id_col)]
    if not isinstance(id_type, pa.DataType):
        id_type = pa.string()
    canon_schema = pa.schema([("a_id", id_type), ("b_id", id_type),
                              ("a_seq", pa.int64()), ("b_seq", pa.int64())])

    def canon(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df[["a_id", "b_id", "a_seq", "b_seq"]], schema=canon_schema,
            preserve_index=False)

    edges = e_min.map_batches(canon, batch_format="pandas").union(
        e_sim.map_batches(canon, batch_format="pandas"))
    dropped = _resolve_edges(edges, distributed_resolve)
    return _apply_drop(ds, id_col, dropped)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (training-data addition): LSH-bucketed
# hyperplane candidates verified by cosine ≥ threshold.
# ---------------------------------------------------------------------------


def embedding_cosine_dedup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_rotations: int = 8,
    seed: int = 1234,
    materialize_input: bool = True,
):
    """Near-dup by embedding cosine: random-hyperplane buckets
    (``n_rotations`` independent plane sets for recall — multi-probe) →
    per-bucket pairwise cosine ≥ threshold → keep-min-id per greedy
    order.  Returns (deduped_ds, n_dropped).

    Recall sizing: a pair at cosine c misses one 16-plane rotation with
    probability ~16·arccos(c)/π — ~12% at the synthesized sf1's
    perturbed-copy angle (~0.023 rad) — so TWO rotations left ~1.5% of
    that corpus's near-identical pairs without a candidate edge (149
    extra survivors over 20k vectors; four rotations still left 4).
    EIGHT rotations put the per-pair miss near 4e-8 at that density;
    candidate volume grows linearly with rotations, never
    quadratically.

    Scale shape: 16 planes → 65k buckets per rotation, so at 10⁹ vectors a
    bucket holds ~15k rows, and the per-bucket pairwise work is additionally
    capped at O(m · MAX_GROUP) with the same head/tail semantics as the text
    dedup paths (tail rows pair against the earliest-id slice only)."""
    if materialize_input:
        ds = ds.materialize()
    MAX_GROUP = 256

    def to_buckets(t: pa.Table) -> pa.Table:
        from ..pipelines.search import HyperplaneLSH

        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        ids = t[id_col].to_pylist()
        tables = []
        for rot in range(n_rotations):  # independent plane sets → recall
            lsh = HyperplaneLSH(vecs.shape[1], n_planes, seed + rot)
            buckets = lsh.bucket(unit) * n_rotations + rot
            tables.append(
                pa.table(
                    {
                        "bucket": pa.array(buckets, pa.int64()),
                        id_col: pa.array(ids),
                        # float64 through the shuffle: this query is
                        # oracle-checked against DuckDB's DOUBLE cosine, and
                        # a float32 round-trip can flip threshold-boundary
                        # pairs to the other side of 0.95
                        "_vec": pa.FixedSizeListArray.from_arrays(
                            pa.array(unit.reshape(-1), pa.float64()),
                            vecs.shape[1],
                        ),
                    }
                )
            )
        return pa.concat_tables(tables)

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": []})
        # greedy order key is the id itself → "earliest" = smallest id
        g = g.drop_duplicates(id_col).sort_values(id_col, kind="stable")
        if len(g) < 2:
            return empty
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in g["_vec"]])
        ids = g[id_col].to_numpy()
        hn = min(len(g), MAX_GROUP)
        head = vecs[:hn]
        sims = head @ head.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        out_a, out_b = [ids[ai]], [ids[bi]]
        # tail rows pair against the retained smallest-id slice only, in
        # bounded matmul chunks — O(m · MAX_GROUP) instead of O(m²)
        for lo in range(hn, len(g), 4096):
            chunk = vecs[lo : lo + 4096]
            sims = chunk @ head.T
            ti, hi = np.nonzero(sims >= threshold)
            out_a.append(ids[hi])
            out_b.append(ids[lo + ti])
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        if not len(a):
            return empty
        return pd.DataFrame({"a_id": a, "b_id": b})

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    edges = buckets.groupby("bucket").map_groups(bucket_edges, batch_format="pandas").to_pandas()
    pairs = (
        [tuple(x) for x in edges[["a_id", "b_id"]].itertuples(index=False)]
        if len(edges) and "a_id" in edges.columns
        else []
    )
    dropped = greedy_resolve(pairs)
    if not dropped:
        return ds, 0
    dropped_list = sorted(dropped)

    def drop_rows(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(dropped_list))
        return t.filter(pc.invert(mask))

    return ds.map_batches(drop_rows, batch_format="pyarrow"), len(dropped)
