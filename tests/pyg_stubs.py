"""Pure-torch stand-ins for torch_geometric / torch_cluster, installed into
sys.modules so the reference model (read-only, /root/reference) can run
in-container for parity tests and baseline timing.

The container has torch (CPU) but not torch_geometric/torch_cluster. The
reference's AttentionLayer only uses a narrow slice of the pyg API
(reference infgen/modules/layers.py:16-113):
  - MessagePassing(aggr='add', node_dim=0) with propagate(edge_index,
    x_dst=..., q=..., k=..., v=..., r=...) -> message(q_i, k_j, v_j, r,
    index, ptr) -> scatter-add -> update(inputs, x_dst)
  - torch_geometric.utils.softmax  (scatter softmax over dst groups)
  - torch_geometric.utils.dense_to_sparse / subgraph
  - torch_cluster.radius / radius_graph (brute-force here; the reference's
    CUDA kernels truncate per-query neighbor lists in scan order, so we do
    the same — parity scenarios keep neighbor counts under the caps)

These stubs implement exactly those semantics; nothing else from pyg is
emulated. Only tests import this module.
"""

import sys
import types

import torch
import torch.nn as nn


# --------------------------------------------------------------------- #
# torch_geometric.nn.conv.MessagePassing
# --------------------------------------------------------------------- #

class MessagePassing(nn.Module):
    """Minimal add-aggregation MessagePassing for the reference AttentionLayer.

    Supports the exact propagate call the reference makes:
      self.propagate(edge_index=edge_index, x_dst=x_dst, q=q, k=k, v=v, r=r)
    with q [N_dst, H, Hd] (suffix _i -> dst-indexed), k/v [N_src, H, Hd]
    (suffix _j -> src-indexed), r [E, D] per-edge passthrough.
    """

    def __init__(self, aggr="add", node_dim=0, **kwargs):
        super().__init__()
        assert aggr == "add"

    def propagate(self, edge_index, x_dst=None, q=None, k=None, v=None, r=None):
        src, dst = edge_index[0], edge_index[1]
        msg = self.message(q_i=q[dst], k_j=k[src], v_j=v[src], r=r,
                           index=dst, ptr=None)
        out = q.new_zeros(q.shape)
        out.index_add_(0, dst, msg)
        return self.update(out, x_dst=x_dst)


def scatter_softmax(src, index, ptr=None, num_nodes=None):
    """torch_geometric.utils.softmax: softmax over groups given by `index`."""
    if num_nodes is None:
        num_nodes = int(index.max()) + 1 if index.numel() else 0
    full = src.new_full((num_nodes, *src.shape[1:]), float("-inf"))
    grp_max = full.index_reduce(0, index, src, "amax", include_self=True)
    out = (src - grp_max.index_select(0, index)).exp()
    denom = out.new_zeros((num_nodes, *out.shape[1:]))
    denom.index_add_(0, index, out)
    return out / (denom.index_select(0, index) + 1e-16)


def dense_to_sparse(adj):
    """[N, N] or [B, N, N] bool/num adjacency -> (edge_index [2, E], values).

    Batched input offsets node ids by b * N (pyg semantics); nonzero order is
    row-major like pyg's.
    """
    if adj.dim() == 2:
        idx = adj.nonzero(as_tuple=False).t()
        return idx, adj[idx[0], idx[1]]
    assert adj.dim() == 3
    B, N, _ = adj.shape
    nz = adj.nonzero(as_tuple=False)       # [E, 3] (b, i, j)
    row = nz[:, 0] * N + nz[:, 1]
    col = nz[:, 0] * N + nz[:, 2]
    return torch.stack([row, col]), adj[nz[:, 0], nz[:, 1], nz[:, 2]]


def subgraph(subset, edge_index, edge_attr=None, **kwargs):
    """Keep edges with both endpoints in `subset` (bool node mask)."""
    m = subset[edge_index[0]] & subset[edge_index[1]]
    return edge_index[:, m], (edge_attr[m] if edge_attr is not None else None)


# --------------------------------------------------------------------- #
# torch_cluster.radius / radius_graph
# --------------------------------------------------------------------- #

def _truncate_per_row(rows, cols, n_rows, max_num):
    """Keep the first `max_num` (row, col) pairs per row; pairs arrive sorted
    row-major (nonzero order), matching the kernels' scan-order truncation."""
    counts = torch.bincount(rows, minlength=n_rows)
    offsets = torch.cat([counts.new_zeros(1), counts.cumsum(0)[:-1]])
    rank = torch.arange(rows.numel()) - offsets[rows]
    keep = rank < max_num
    return rows[keep], cols[keep]


def _radius_block(x, y, r, max_num, y0=0, x0=0):
    dist = torch.cdist(y.float(), x.float())
    ok = dist <= r
    nz = ok.nonzero(as_tuple=False)             # row-major: per-y scan order
    rows, cols = _truncate_per_row(nz[:, 0], nz[:, 1], y.shape[0], max_num)
    return rows + y0, cols + x0


def radius(x, y, r, batch_x=None, batch_y=None, max_num_neighbors=32):
    """For each y[i], x-points within r. Returns [2, E]: row0 = y idx,
    row1 = x idx. Neighbor lists truncate in x-index scan order like the
    reference's kernels. Batched inputs must be block-sorted by batch id
    (the reference always passes `arange(T).repeat_interleave(n)`-style
    vectors), letting us compute per-block distances instead of one giant
    cdist."""
    if batch_x is None or batch_y is None:
        rows, cols = _radius_block(x, y, r, max_num_neighbors)
        return torch.stack([rows, cols])
    assert (batch_x.diff() >= 0).all() and (batch_y.diff() >= 0).all(), \
        "stub radius requires block-sorted batch vectors"
    n_b = int(max(batch_x.max(), batch_y.max())) + 1
    bx = torch.searchsorted(batch_x, torch.arange(n_b + 1))
    by = torch.searchsorted(batch_y, torch.arange(n_b + 1))
    rows_l, cols_l = [], []
    for b in range(n_b):
        if by[b] == by[b + 1] or bx[b] == bx[b + 1]:
            continue
        rows, cols = _radius_block(x[bx[b]:bx[b + 1]], y[by[b]:by[b + 1]], r,
                                   max_num_neighbors, y0=int(by[b]), x0=int(bx[b]))
        rows_l.append(rows)
        cols_l.append(cols)
    if not rows_l:
        return torch.zeros(2, 0, dtype=torch.long)
    return torch.stack([torch.cat(rows_l), torch.cat(cols_l)])


def radius_graph(x, r, batch=None, loop=False, max_num_neighbors=32):
    """Edges [2, E] with row0 = neighbor (src), row1 = center (dst)."""
    ei = radius(x, x, r, batch, batch, max_num_neighbors + (0 if loop else 1))
    row, col = ei[1], ei[0]                     # src, dst
    if not loop:
        m = row != col
        row, col = row[m], col[m]
    # re-truncate per dst to max_num_neighbors after self-removal; edges are
    # sorted by dst (y-major from radius())
    col2, row2 = _truncate_per_row(col, row, x.shape[0], max_num_neighbors)
    return torch.stack([row2, col2])


# --------------------------------------------------------------------- #
# torch_geometric.data.HeteroData stand-in
# --------------------------------------------------------------------- #

class FakeHeteroData:
    """dict-of-dicts with the attribute surface the reference model touches."""

    def __init__(self):
        self._store = {}
        self.num_graphs = 1

    def __getitem__(self, key):
        if key not in self._store:
            self._store[key] = {}
        return self._store[key]

    def __setitem__(self, key, value):
        self._store[key] = value

    def __contains__(self, key):
        return key in self._store


class Batch:  # only imported, never constructed by the paths we exercise
    @staticmethod
    def from_data_list(lst):
        raise NotImplementedError


def install():
    """Install stub modules into sys.modules (idempotent)."""
    if "torch_geometric" in sys.modules and not getattr(
            sys.modules["torch_geometric"], "_infgen_tpu_stub", False):
        return  # real pyg present; don't clobber

    def mod(name, **attrs):
        m = types.ModuleType(name)
        m._infgen_tpu_stub = True
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    tg = mod("torch_geometric")
    tg.nn = mod("torch_geometric.nn")
    tg.nn.conv = mod("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    tg.nn.MessagePassing = MessagePassing
    def degree(index, num_nodes=None, dtype=None):
        n = int(index.max()) + 1 if num_nodes is None else int(num_nodes)
        out = torch.zeros(n, dtype=dtype or torch.long)
        return out.scatter_add_(0, index.long(),
                                torch.ones_like(index, dtype=out.dtype))

    tg.utils = mod("torch_geometric.utils", softmax=scatter_softmax,
                   dense_to_sparse=dense_to_sparse, subgraph=subgraph,
                   degree=degree)
    tg.data = mod("torch_geometric.data", HeteroData=FakeHeteroData, Batch=Batch,
                  Dataset=object)
    tg.transforms = mod("torch_geometric.transforms", BaseTransform=object)
    tg.loader = mod("torch_geometric.loader", DataLoader=object)
    mod("torch_cluster", radius=radius, radius_graph=radius_graph)

    # the reference's visualization module drags in tensorflow/seaborn/waymo
    # SDK; the model files only reference plot helpers behind env flags
    viz_names = ["plot_interact_edge", "plot_map_edge", "plot_insert_grid",
                 "plot_occ_grid", "plot_prob_seed", "plot_val", "safe_run"]

    def _noop(*a, **k):
        return None

    mod("infgen.utils.visualization", __all__=viz_names,
        **{n: _noop for n in viz_names})
