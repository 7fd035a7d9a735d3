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
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SLNode:
    node_id: int
    level: float  # merge distance (0 for leaves)
    size: int
    members: tuple  # leaf ids (kept for canonical labeling; dendrogram is O(n))
    left: "SLNode | None" = None
    right: "SLNode | None" = None


def single_linkage_tree(point_ids: list, edges: list[tuple]) -> SLNode:
    """Build the dendrogram from MST ``edges`` [(src, dst, w), ...].
    Assumes the edges span all ``point_ids`` (one component)."""
    nodes: dict = {pid: SLNode(i, 0.0, 1, (pid,)) for i, pid in enumerate(sorted(point_ids))}
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
        merged = SLNode(
            next_id, float(w), na.size + nb.size, na.members + nb.members, na, nb
        )
        next_id += 1
        parent[rb] = ra
        nodes[ra] = merged
        root = merged
    return root


def cut_tree(root: SLNode, cut_level: float, min_cluster_size: int = 1) -> dict:
    """Flat labels: clusters = maximal subtrees fully merged strictly
    below ``cut_level`` with size ≥ min_cluster_size; everything else
    noise (``None`` — unambiguous even when a cluster's min member id
    is 0). Cluster label = min member id."""
    labels: dict = {}

    def assign(node: SLNode):
        if node.level < cut_level:
            if node.size >= min_cluster_size:
                lab = min(node.members)
                for m in node.members:
                    labels[m] = lab
            else:
                for m in node.members:
                    labels[m] = None
            return
        assign(node.left)
        assign(node.right)

    assign(root)
    return labels


@dataclass
class CondensedNode:
    cnode_id: int
    lambda_min: float  # birth λ of this cluster
    members: list = field(default_factory=list)  # (point_id, lambda_fell_out)
    children: list = field(default_factory=list)
    stability: float = 0.0
    selected: bool = False


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

    def walk(node: SLNode, cluster: CondensedNode):
        if node.left is None:
            lam = 1.0 / node.level if node.level > 0 else float("inf")
            # leaf reached: it falls out when its parent merge dissolves —
            # handled by caller passing the split λ; keep as member
            cluster.members.append((node.members[0], lam))
            return
        lam = 1.0 / node.level if node.level > 0 else float("inf")
        big_l = node.left.size >= min_cluster_size
        big_r = node.right.size >= min_cluster_size
        if big_l and big_r:
            cl = new_cnode(lam)
            cr = new_cnode(lam)
            cluster.children.extend([cl, cr])
            walk(node.left, cl)
            walk(node.right, cr)
        else:
            # the small side(s) fall out of `cluster` at λ
            for side, big in ((node.left, big_l), (node.right, big_r)):
                if big:
                    walk(side, cluster)
                else:
                    for m in side.members:
                        cluster.members.append((m, lam))
    walk(root, top)
    return top


def compute_stability(cnode: CondensedNode) -> float:
    """stability = Σ_members (λ_fell − λ_born) (CondensedClusterNode.hpp:83-88),
    computed over direct members; child subtrees have their own."""
    lam0 = cnode.lambda_min
    s = sum(min(lam, 1e18) - lam0 for _, lam in cnode.members)
    # members that persisted into child clusters contribute (λ_child_birth − λ_born)
    for ch in cnode.children:
        n_ch = _subtree_point_count(ch)
        s += n_ch * (ch.lambda_min - lam0)
    cnode.stability = s
    for ch in cnode.children:
        compute_stability(ch)
    return s


def _subtree_point_count(cnode: CondensedNode) -> int:
    return len(cnode.members) + sum(_subtree_point_count(c) for c in cnode.children)


def select_clusters(cnode: CondensedNode, allow_single_cluster: bool = True) -> None:
    """Excess-of-mass selection (CondensedClusterTree.hpp:264-287):
    a node is selected if its stability exceeds the sum of its
    children's selected stabilities; otherwise the children win."""

    def walk(c: CondensedNode) -> float:
        if not c.children:
            c.selected = True
            return c.stability
        child_sum = sum(walk(ch) for ch in c.children)
        if c.stability >= child_sum:
            c.selected = True
            _deselect_descendants(c)
            return c.stability
        c.selected = False
        return child_sum

    walk(cnode)
    if not allow_single_cluster and cnode.selected and cnode.children:
        cnode.selected = False
        for ch in cnode.children:
            walk(ch)


def _deselect_descendants(c: CondensedNode) -> None:
    for ch in c.children:
        ch.selected = False
        _deselect_descendants(ch)


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
        pts = [m for m, _ in c.members]
        for ch in c.children:
            pts += collect_points(ch)
        return pts

    def walk(c: CondensedNode):
        if c.selected:
            pts = collect_points(c)
            lab = min(pts)
            for p in pts:
                labels[p] = lab
            return
        for ch in c.children:
            walk(ch)

    walk(top)
    return labels
