"""Driver-side cluster hierarchies over MST edges.

The dendrogram is O(n) — tiny relative to the data — so, as in the
build plan (SURVEY.md §2.9), these run on the driver over the
collected MST:

- ``single_linkage_tree``: sort edges by weight, union-find replay
  creating binary merge nodes (level = merge distance, size =
  descendant count) — reference ``SingleLinkageClusterTree.hpp:177-221``.
- ``cut_tree``: flat labels at ``cut_level`` with ``min_cluster_size``
  (noise = 0) — reference ``SingleLinkageClusterTree.hpp:151-175``.
  Labels are canonicalized to the min member id per cluster (same
  convention as the engine's DBSCAN).
- ``condense_tree`` + ``select_clusters`` (HDBSCAN): condense by
  min_cluster_size, stability = Σ size·(λ − λ_min) with λ = 1/level,
  excess-of-mass selection, flat labels 1.. with noise 0 — reference
  ``CondensedClusterTree.hpp:110-315``, ``CondensedClusterNode.hpp:83-88``.

Memory/recursion discipline: nodes carry [lo, hi) index ranges over
one shared leaf-permutation list instead of per-node member tuples
(the tuple concatenation was O(n·depth) — O(n²) on a degenerate chain
dendrogram), and every tree walk is an explicit-stack loop, so a
50k-point chain MST neither blows Python's recursion limit nor spikes
memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SLNode:
    node_id: int
    level: float  # merge distance (0 for leaves)
    size: int
    left: "SLNode | None" = None
    right: "SLNode | None" = None
    leaf: object = None  # leaf id (leaves only)
    lo: int = 0  # [lo, hi) slice of the shared leaves list
    hi: int = 0
    leaves: list = None  # shared leaf-permutation list (all nodes)
    edge: tuple | None = None  # the MST (src, dst) that made this merge

    @property
    def members(self):
        """Leaf ids under this node — a slice view of the shared
        permutation (kept for API compatibility; O(size) on access,
        never stored per node)."""
        return self.leaves[self.lo : self.hi]


def single_linkage_tree(point_ids: list, edges: list[tuple]) -> SLNode:
    """Build the dendrogram from MST ``edges`` [(src, dst, w), ...].
    Assumes the edges span all ``point_ids`` (one component)."""
    nodes: dict = {
        pid: SLNode(i, 0.0, 1, leaf=pid) for i, pid in enumerate(sorted(point_ids))
    }
    parent: dict = {pid: pid for pid in point_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    next_id = len(point_ids)
    root = None
    for src, dst, w in sorted(edges, key=lambda e: (e[2], str(e[0]), str(e[1]))):
        ra, rb = find(src), find(dst)
        if ra == rb:
            continue
        na, nb = nodes[ra], nodes[rb]
        merged = SLNode(next_id, float(w), na.size + nb.size, na, nb, edge=(src, dst))
        next_id += 1
        parent[rb] = ra
        nodes[ra] = merged
        root = merged
    if root is not None:
        _assign_ranges(root)
    return root  # None when no merge happened (≤1 point or no edges)


def _assign_ranges(root: SLNode) -> None:
    """One iterative DFS: fill the shared leaves list in left-to-right
    order and give every node its [lo, hi) slice."""
    leaves: list = []
    # (node, entered) explicit stack — post-order hi assignment
    stack = [(root, False)]
    while stack:
        node, entered = stack.pop()
        if node.left is None:
            node.lo = len(leaves)
            leaves.append(node.leaf)
            node.hi = len(leaves)
            node.leaves = leaves
            continue
        if not entered:
            node.lo = len(leaves)  # provisional; leaves appended in order
            stack.append((node, True))
            stack.append((node.right, False))
            stack.append((node.left, False))
        else:
            node.hi = len(leaves)
            node.leaves = leaves


def cut_tree(root: SLNode, cut_level: float, min_cluster_size: int = 1) -> dict:
    """Flat labels: clusters = maximal subtrees fully merged strictly
    below ``cut_level`` with size ≥ min_cluster_size; everything else
    noise (``None`` — unambiguous even when a cluster's min member id
    is 0). Cluster label = min member id."""
    labels: dict = {}
    stack = [root]
    while stack:
        node = stack.pop()
        if node.level < cut_level:
            mem = node.members
            if node.size >= min_cluster_size:
                lab = min(mem)
                for m in mem:
                    labels[m] = lab
            else:
                for m in mem:
                    labels[m] = None
            continue
        stack.append(node.left)
        stack.append(node.right)
    return labels


@dataclass
class CondensedNode:
    cnode_id: int
    lambda_min: float  # birth λ of this cluster
    members: list = field(default_factory=list)  # (point_id, lambda_fell_out)
    children: list = field(default_factory=list)
    stability: float = 0.0
    selected: bool = False
    birth: "SLNode | None" = None  # dendrogram subtree this cluster spans


def condense_tree(root: SLNode, min_cluster_size: int) -> CondensedNode:
    """Condense the dendrogram: walking down from the root, a split is
    *real* only if both sides have ≥ min_cluster_size points; smaller
    sides "fall out" of the parent cluster at that λ (reference
    ``CondensedClusterTree.hpp:143-220``)."""
    counter = [0]

    def new_cnode(lambda_min: float) -> CondensedNode:
        counter[0] += 1
        return CondensedNode(counter[0], lambda_min)

    top = new_cnode(0.0)
    top.birth = root
    stack = [(root, top)]
    while stack:
        node, cluster = stack.pop()
        if node.left is None:
            lam = 1.0 / node.level if node.level > 0 else float("inf")
            cluster.members.append((node.leaf, lam))
            continue
        lam = 1.0 / node.level if node.level > 0 else float("inf")
        big_l = node.left.size >= min_cluster_size
        big_r = node.right.size >= min_cluster_size
        if big_l and big_r:
            cl = new_cnode(lam)
            cr = new_cnode(lam)
            cl.birth = node.left
            cr.birth = node.right
            cluster.children.extend([cl, cr])
            stack.append((node.left, cl))
            stack.append((node.right, cr))
        else:
            # the small side(s) fall out of `cluster` at λ
            for side, big in ((node.left, big_l), (node.right, big_r)):
                if big:
                    stack.append((side, cluster))
                else:
                    for m in side.members:
                        cluster.members.append((m, lam))
    return top


def compute_stability(cnode: CondensedNode) -> float:
    """stability = Σ_members (λ_fell − λ_born) (CondensedClusterNode.hpp:83-88),
    computed over direct members; child subtrees have their own."""
    # post-order over an explicit stack: children's point counts are
    # needed before the parent's stability
    order: list[CondensedNode] = []
    stack = [cnode]
    while stack:
        c = stack.pop()
        order.append(c)
        stack.extend(c.children)
    counts: dict[int, int] = {}
    for c in reversed(order):
        counts[c.cnode_id] = len(c.members) + sum(
            counts[ch.cnode_id] for ch in c.children
        )
        lam0 = c.lambda_min
        s = sum(min(lam, 1e18) - lam0 for _, lam in c.members)
        for ch in c.children:
            s += counts[ch.cnode_id] * (ch.lambda_min - lam0)
        c.stability = s
    return cnode.stability


def _subtree_point_count(cnode: CondensedNode) -> int:
    total = 0
    stack = [cnode]
    while stack:
        c = stack.pop()
        total += len(c.members)
        stack.extend(c.children)
    return total


def select_clusters(cnode: CondensedNode, allow_single_cluster: bool = True) -> None:
    """Excess-of-mass selection (CondensedClusterTree.hpp:264-287):
    a node is selected if its stability exceeds the sum of its
    children's selected stabilities; otherwise the children win."""

    def walk(top: CondensedNode) -> float:
        order: list[CondensedNode] = []
        stack = [top]
        while stack:
            c = stack.pop()
            order.append(c)
            stack.extend(c.children)
        best: dict[int, float] = {}  # selected-stability of each subtree
        for c in reversed(order):
            if not c.children:
                c.selected = True
                best[c.cnode_id] = c.stability
                continue
            child_sum = sum(best[ch.cnode_id] for ch in c.children)
            if c.stability >= child_sum:
                c.selected = True
                _deselect_descendants(c)
                best[c.cnode_id] = c.stability
            else:
                c.selected = False
                best[c.cnode_id] = child_sum
        return best[top.cnode_id]

    walk(cnode)
    if not allow_single_cluster and cnode.selected and cnode.children:
        cnode.selected = False
        for ch in cnode.children:
            walk(ch)


def _deselect_descendants(c: CondensedNode) -> None:
    stack = list(c.children)
    while stack:
        ch = stack.pop()
        ch.selected = False
        stack.extend(ch.children)


def hdbscan_partition(
    point_ids: list,
    mst_edges: list[tuple],
    min_cluster_size: int = 5,
    allow_single_cluster: bool = True,
) -> tuple[list[tuple], list]:
    """Driver-side HDBSCAN *plan* for distributed label emission:
    ``(removed_edges, selected_labels)``.

    Every selected condensed cluster spans one dendrogram subtree (its
    ``birth`` node, an antichain across clusters), and that subtree's
    leaf set is exactly the connected component of its internal MST
    edges — so flat labels are ONE distributed connected-components
    pass over the MST edge DataFrame minus ``removed_edges`` (the
    merges NOT inside any selected subtree), with components whose min
    id is in ``selected_labels`` keeping the label and everything else
    noise. ``removed_edges`` is O(#noise points + #clusters) — the
    driver uploads cluster *metadata*, never point-count label rows
    (round-3 VERDICT task #3; reference ``CondensedClusterTree.hpp:
    222-262`` walks the same selected-subtree memberships).

    Label values match :func:`hdbscan_labels` exactly (min member id
    per selected cluster; both walk the identical selection)."""
    root = single_linkage_tree(point_ids, mst_edges)
    if root is None:
        return list(mst_edges), []
    top = condense_tree(root, min_cluster_size)
    compute_stability(top)
    select_clusters(top, allow_single_cluster)

    kept: set[tuple] = set()
    labels: list = []
    stack = [top]
    while stack:
        c = stack.pop()
        if not c.selected:
            stack.extend(c.children)
            continue
        mem = c.birth.members
        labels.append(min(mem))
        # internal merges of the birth subtree = the edges that keep
        # this cluster one component
        sub = [c.birth]
        while sub:
            node = sub.pop()
            if node.left is None:
                continue
            kept.add(node.edge)
            sub.append(node.left)
            sub.append(node.right)
    removed = [e for s, d, _ in mst_edges if (e := (s, d)) not in kept]
    return removed, labels


def hdbscan_labels(
    point_ids: list,
    mst_edges: list[tuple],
    min_cluster_size: int = 5,
    allow_single_cluster: bool = True,
) -> dict:
    """Flat HDBSCAN labels from a (mutual-reachability) MST: shallowest
    selected condensed nodes become clusters (labels = min member id,
    noise ``None``) — reference ``HDBSCAN.hpp:91-116`` composition."""
    root = single_linkage_tree(point_ids, mst_edges)
    if root is None:
        return {p: None for p in point_ids}
    top = condense_tree(root, min_cluster_size)
    compute_stability(top)
    select_clusters(top, allow_single_cluster)
    labels = {p: None for p in point_ids}

    def collect_points(c: CondensedNode) -> list:
        pts = []
        stack = [c]
        while stack:
            cur = stack.pop()
            pts.extend(m for m, _ in cur.members)
            stack.extend(cur.children)
        return pts

    stack = [top]
    while stack:
        c = stack.pop()
        if c.selected:
            pts = collect_points(c)
            lab = min(pts)
            for p in pts:
                labels[p] = lab
            continue
        stack.extend(c.children)
    return labels


def slt_to_json(root: SLNode, max_depth: int | None = None) -> dict:
    """Nested-JSON export of the single-linkage merge tree — the
    engine's twin of the reference's dendrogram serialization
    (``SingleLinkageClusterTree.hpp:81`` stores the root for
    ``serialize``; ``:240-245`` writes level / size / children
    recursively). Per node: ``level`` (merge distance; 0.0 at leaves),
    ``size`` (descendant leaf count), ``rep`` (min leaf id — the
    engine's canonical cluster label convention), ``leaf`` (leaf id,
    leaves only) and ``children``. ``max_depth`` bounds the export to
    the top levels (the scale form: the full dendrogram is O(n) driver
    metadata, the JSON an operator report).

    Iterative: reps flow bottom-up in one post-order pass and the
    nested dicts assemble on an explicit stack — a 50k chain
    dendrogram must neither recurse nor pay O(n·depth) member scans."""
    if root is None:
        return {"root": None}
    # post-order: children's dicts exist before the parent's
    order: list[SLNode] = []
    stack = [root]
    while stack:
        node = stack.pop()
        order.append(node)
        if node.left is not None:
            stack.append(node.left)
            stack.append(node.right)
    built: dict[int, dict] = {}
    reps: dict[int, object] = {}
    depth: dict[int, int] = {root.node_id: 0}
    for node in order:
        if node.left is not None:
            for ch in (node.left, node.right):
                depth[ch.node_id] = depth[node.node_id] + 1
    for node in reversed(order):
        if node.left is None:
            reps[node.node_id] = node.leaf
            built[node.node_id] = {
                "level": 0.0,
                "size": 1,
                "rep": node.leaf,
                "leaf": node.leaf,
                "children": [],
            }
            continue
        rl, rr = reps[node.left.node_id], reps[node.right.node_id]
        reps[node.node_id] = min(rl, rr)
        kids = sorted(
            (built[node.left.node_id], built[node.right.node_id]),
            key=lambda c: str(c["rep"]),
        )
        if max_depth is not None and depth[node.node_id] >= max_depth:
            kids = []  # truncate below the export horizon
        built[node.node_id] = {
            "level": float(node.level),
            "size": node.size,
            "rep": reps[node.node_id],
            "children": kids,
        }
    return {"root": built[root.node_id]}
