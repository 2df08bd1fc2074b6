"""Model export / serving utilities.

Production-deployment surface:
  * `export_forward` / `load_forward`: compile a trained FSW-GNN's forward
    into a serialized ahead-of-time artifact (`jax.export` StableHLO) a
    serving process can run without Python model code.
  * `export_from_checkpoint`: orbax checkpoint directory -> artifact.
  * `GraphServer`: online inference on ARBITRARY request graphs with ONE
    compile -- the TPU-idiomatic serving pattern: fix a padded
    (max_nodes, max_edges) CSR envelope at startup, pad every request into
    it (zero-weight edges and isolated pad nodes are exact no-ops through
    the FSW quadrature), and reuse the single compiled executable.  With
    2-7 minute compiles through a remote-compile tunnel, per-request
    recompilation is not an option; with XLA anywhere it is still waste.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph, MultiTable, NeighborTable, from_edge_index
from .utils.cache import CountingJit


def export_forward(model, variables, X_spec, graph, *,
                   platform: Optional[str] = None) -> bytes:
    """Serialize the jitted forward (closed over variables and the static
    graph) to a portable StableHLO artifact.

    X_spec: jax.ShapeDtypeStruct for the node-feature input.
    platform: lowering platform ('tpu', 'cpu'); defaults to the current
    backend.
    """
    from jax import export as jexport

    def fwd(X):
        return model.apply(variables, X, graph)

    exp = jexport.export(
        jax.jit(fwd),
        platforms=[platform] if platform else None)(X_spec)
    return bytes(exp.serialize())


def load_forward(blob: bytes):
    """Deserialize an exported forward; returns a callable(X) -> logits."""
    from jax import export as jexport
    exp = jexport.deserialize(blob)
    return lambda X: exp.call(X)


def save_artifact(path: str, blob: bytes):
    with open(path, 'wb') as f:
        f.write(blob)


def load_artifact(path: str):
    with open(path, 'rb') as f:
        return load_forward(f.read())


def export_from_checkpoint(checkpoint_dir: str, model, variables_like,
                           X_spec, graph, *, step: Optional[int] = None,
                           platform: Optional[str] = None) -> bytes:
    """Restore the latest (or `step`) orbax checkpoint and export its
    forward.  `variables_like` supplies the pytree structure to restore
    into (e.g. `model.init(...)` output split the way Trainer stores it:
    {'params': ..., 'opt_state': ..., 'batch_stats': ..., 'fixed': ...});
    only the model collections are used for the export."""
    import orbax.checkpoint as ocp
    import os
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(step,
                           args=ocp.args.StandardRestore(variables_like))
    variables = {'params': restored['params'],
                 **(restored.get('batch_stats') or {}),
                 **restored['fixed']}
    return export_forward(model, variables, X_spec, graph,
                          platform=platform)


def multi_envelope(reference_graph: Graph, max_nodes: int,
                   headroom: float = 1.5):
    """A pinned degree-class envelope (classes, class_rows) for the
    MultiTable fast serving path, sized from a representative graph.

    classes: bucket widths covering `headroom` x the reference max degree;
    class_rows: per-class padded row capacities -- the reference's class
    occupancy x headroom, except class 0 which must hold every possible
    zero/low-degree row (envelope padding makes node-count slack land
    there), so it is pinned to max_nodes.
    """
    from .graph import degree_classes
    row_ptr = np.asarray(reference_graph.row_ptr, np.int64)
    E_real = reference_graph.num_edges
    deg = (np.minimum(row_ptr[1:], E_real)
           - np.minimum(row_ptr[:-1], E_real))
    max_deg = int(deg.max()) if deg.size else 1
    classes = degree_classes(max(int(np.ceil(max_deg * headroom)), 1))
    cls_of = np.zeros(deg.shape[0], np.int64)
    for ci, Bc in enumerate(classes):
        lo = 0 if ci == 0 else classes[ci - 1]
        cls_of[(deg > lo) & (deg <= Bc)] = ci
    cls_of[deg == 0] = 0
    counts = np.bincount(cls_of, minlength=len(classes))
    rows = [int(min(max_nodes,
                    max(8, -(-int(c * headroom) // 8) * 8)))
            for c in counts]
    rows[0] = int(max_nodes)
    return list(classes), rows


class GraphServer:
    """One-compile online inference over arbitrary request graphs.

    Two layouts:
      * 'csr' (always available): the CSR layout's array shapes depend
        only on the (max_nodes, max_edges) envelope, never on a request's
        degree distribution, so every request hits the same compiled
        executable.
      * 'multi' (the fast path, ~2.2x per BENCH.md ablations): a PINNED
        degree-class envelope (`classes` + per-class `class_rows`, e.g.
        from `multi_envelope`) makes the MultiTable layout's shapes
        request-independent too -- exactly the trick the distributed
        partitioner uses to stack per-shard tables.  Requests whose degree
        histogram fits the envelope run the MultiTable + rank-kernel path;
        overflowing requests fall back to the CSR executable (both
        compiled once).

    Requests are padded with isolated nodes (zero features, zero in-edges
    -> phantom-mass neighborhoods) and zero-weight edges, both exact
    no-ops for real outputs.

    Transfer layout: request graphs are built entirely host-side (numpy)
    and shipped packed as ONE int32 carrier buffer [graph ints | graph
    floats | X], all bit-views (exact, no value conversion on the wire),
    bitcast + sliced back by static XLA ops inside the compiled forward
    -- a request costs exactly 1 host->device transfer + 1 device->host
    readback.  Wire-byte minimization on top: indices ship as
    pair-packed uint16 whenever every index value fits (envelope
    max(nodes, edges) <= 65535 -- node ids, edge positions, row_ptr
    entries, and the row-id sentinel all stay in range), and a 2-byte
    `dtype` (bf16) pair-packs its floats the same way.  This is the
    serving analogue of the reference's pay-layout-cost-once invariant
    (/root/reference/fsw_embedding.py:2269-2278); the measured
    tunnel-class law (BENCH.md "Online serving") is that request latency
    is transfer-BYTE-bound (~22 MB/s effective), so bytes -- not buffer
    count -- are the lever.  Dtypes with other widths (e.g. f64) fall
    back to the 3-transfer layout (X + int buffer + dtype buffer).
    Every per-request device op must also be REQUEST-SHAPE-INVARIANT:
    see `predict` for the output-slice compile trap that dominated round
    4's numbers.
    """

    def __init__(self, model, variables, max_nodes: int, max_edges: int,
                 *, d_edge: int = 0, dtype=jnp.float32,
                 classes=None, class_rows=None,
                 assume_uniform_w: bool = False,
                 transfer_layout: str = 'auto',
                 pack_indices: Optional[bool] = None):
        self.model = model
        self.variables = variables
        self.max_nodes = int(max_nodes)
        self.max_edges = int(max_edges)
        self.d_edge = int(d_edge)
        self.dtype = dtype
        # pinned static uniform_w for request tables (see _dispatch): the
        # per-request detected flag is data-dependent static metadata and
        # would fork the compile cache
        self.assume_uniform_w = bool(assume_uniform_w)
        # single-buffer transfer layout: bit-width-preserving views between
        # the graph ints / graph floats / X and one int32 carrier.  2-byte
        # payloads (bf16 floats; uint16 indices when every index value --
        # node ids, edge positions, row_ptr entries, the row-id sentinel
        # max_nodes -- fits) ride PAIR-PACKED in the carrier words, halving
        # their wire bytes; the tunnel-class measurement (BENCH.md "Online
        # serving") shows request latency is transfer-BYTE-bound, not
        # buffer-count bound.
        self._itemsize = np.dtype(self.dtype).itemsize
        # transfer_layout: 'single' forces the one-carrier layout, 'triple'
        # the legacy 3-transfer layout (X + int buffer + float buffer),
        # 'auto' picks single whenever the dtype width supports bit-views.
        # pack_indices: force the uint16 index packing on/off (None =
        # auto: on whenever the envelope guarantees every value fits).
        # Explicit knobs exist for measurement (the serving laws were
        # established by same-process A/B, BENCH.md) and for link types
        # where decode cost beats wire bytes.
        assert transfer_layout in ('auto', 'single', 'triple')
        # max_nodes >= 2 guarantees d_in is recoverable from the carrier
        # length even with one pair-pack padding element (see _unpack_x)
        can_single = (self._itemsize == 4
                      or (self._itemsize == 2 and self.max_nodes >= 2))
        if transfer_layout == 'single':
            assert can_single, (
                f'single-buffer layout needs a 2/4-byte dtype '
                f'(got itemsize {self._itemsize})')
        self._single_buffer = (can_single if transfer_layout == 'auto'
                               else transfer_layout == 'single')
        idx_fits = max(self.max_nodes, self.max_edges) <= 65535
        if pack_indices:
            assert idx_fits, ('pack_indices=True needs '
                              'max(max_nodes, max_edges) <= 65535')
        self._idx16 = (self._single_buffer
                       and (idx_fits if pack_indices is None
                            else bool(pack_indices)))
        E, R, de = self.max_edges, self.max_nodes, self.d_edge
        self._li_csr = 4 * E + R + 1            # src,dst,row_ptr,order,sorted
        self._lf_csr = E + R + E * de           # weight,in_degrees,edge_feat
        if self._single_buffer:
            self._fwd = CountingJit(
                lambda variables, buf: model.apply(
                    variables, self._unpack_x(buf, self._li_csr,
                                              self._lf_csr),
                    self._unpack_csr(*self._split(buf, self._li_csr,
                                                  self._lf_csr))))
        else:
            self._fwd = CountingJit(
                lambda variables, X, ibuf, fbuf: model.apply(
                    variables, X, self._unpack_csr(ibuf, fbuf)))
        assert (classes is None) == (class_rows is None), (
            'pass classes and class_rows together (see multi_envelope)')
        self.classes = None if classes is None else list(classes)
        self.class_rows = None if class_rows is None else list(class_rows)
        self.fallbacks = 0          # requests that overflowed the envelope
        self.uniform_w_fallbacks = 0   # assume_uniform_w requests that
        #                                failed host verification (served
        #                                correctly on the CSR path)
        if self.classes is not None:
            assert len(self.classes) == len(self.class_rows)
            tot = sum(rc * bc for rc, bc in zip(self.class_rows,
                                                self.classes))
            rows = sum(self.class_rows)
            self._li_multi = tot + rows         # per-class idx + row_ids
            self._lf_multi = tot + R + tot * de # weights,in_degrees,edge_feat
            if self._single_buffer:
                self._fwd_multi = CountingJit(
                    lambda variables, buf: model.apply(
                        variables, self._unpack_x(buf, self._li_multi,
                                                  self._lf_multi),
                        self._unpack_multi(*self._split(buf, self._li_multi,
                                                        self._lf_multi))))
            else:
                self._fwd_multi = CountingJit(
                    lambda variables, X, ibuf, fbuf: model.apply(
                        variables, X, self._unpack_multi(ibuf, fbuf)))

    def _pad_graph(self, edge_index, edge_features=None) -> Graph:
        """Host-side (numpy-leaf) padded CSR request graph -- no device
        transfers happen until the packed buffers ship."""
        return from_edge_index(edge_index, self.max_nodes,
                               edge_features=edge_features,
                               pad_to=self.max_edges, dtype=self.dtype,
                               as_numpy=True)

    # ---- packed transfer layout (host pack / in-jit unpack) -------------

    def _pack_all(self, ibuf, fbuf, Xp) -> np.ndarray:
        """Single int32 carrier: [int bits | float bits | X bits].  The
        views are exact bit copies (no value conversion on the wire);
        2-byte elements are pair-packed into carrier words."""
        parts = [self._pack16(ibuf.astype(np.uint16)) if self._idx16
                 else ibuf]
        for arr in (fbuf, np.ravel(Xp)):
            parts.append(arr.view(np.int32) if self._itemsize == 4
                         else self._pack16(arr))
        return np.concatenate(parts)

    @staticmethod
    def _pack16(arr) -> np.ndarray:
        if arr.size % 2:
            arr = np.concatenate([arr, np.zeros(1, arr.dtype)])
        return arr.view(np.int32)

    # carrier-word counts for a logical element count
    def _wi(self, li):
        return -(-li // 2) if self._idx16 else li

    def _wf(self, lf):
        return lf if self._itemsize == 4 else -(-lf // 2)

    def _decode16(self, words, dtype, n):
        """int32 words -> n elements of 2-byte `dtype` (in-jit)."""
        v = jax.lax.bitcast_convert_type(words, dtype)     # (w, 2)
        return v.reshape(-1)[:n]

    def _split(self, buf, li, lf):
        """In-jit inverse of `_pack_all` for the graph part: static
        slices + bitcasts only (request-shape-invariant)."""
        wi, wf = self._wi(li), self._wf(lf)
        if self._idx16:
            ibuf = self._decode16(buf[:wi], jnp.uint16, li).astype(jnp.int32)
        else:
            ibuf = buf[:wi]
        fw = buf[wi:wi + wf]
        fbuf = (jax.lax.bitcast_convert_type(fw, self.dtype)
                if self._itemsize == 4
                else self._decode16(fw, self.dtype, lf))
        return ibuf, fbuf

    def _unpack_x(self, buf, li, lf):
        xw = buf[self._wi(li) + self._wf(lf):]
        R = self.max_nodes
        if self._itemsize == 4:
            return jax.lax.bitcast_convert_type(
                xw, self.dtype).reshape(R, -1)
        # 2-byte: xw carries R*d_in elements (+ at most 1 pair padding),
        # so d_in = (2*len) // R is exact whenever R >= 2 (enforced at
        # __init__); shapes here are static at trace time
        d_in = (2 * xw.shape[0]) // R
        return self._decode16(xw, self.dtype, R * d_in).reshape(R, d_in)

    def _pack_csr(self, g: Graph):
        ibuf = np.concatenate([np.asarray(a) for a in (
            g.src, g.dst, g.row_ptr, g.src_order,
            g.src_sorted)]).astype(np.int32)
        fparts = [np.asarray(g.weight), np.asarray(g.in_degrees)]
        if self.d_edge:
            fparts.append(np.ravel(np.asarray(g.edge_feat)))
        fbuf = np.concatenate(fparts).astype(np.dtype(self.dtype))
        return ibuf, fbuf

    def _unpack_csr(self, ibuf, fbuf) -> Graph:
        E, R, de = self.max_edges, self.max_nodes, self.d_edge
        ef = (fbuf[E + R:E + R + E * de].reshape(E, de) if de else None)
        return Graph(
            src=ibuf[:E], dst=ibuf[E:2 * E],
            weight=fbuf[:E],
            row_ptr=ibuf[2 * E:2 * E + R + 1],
            in_degrees=fbuf[E:E + R],
            edge_feat=ef,
            src_order=ibuf[2 * E + R + 1:3 * E + R + 1],
            src_sorted=ibuf[3 * E + R + 1:4 * E + R + 1],
            num_nodes=R, num_recipients=R, num_edges=E)

    def _pack_multi(self, mt: MultiTable):
        ibuf = np.concatenate(
            [np.ravel(np.asarray(t.idx)) for t in mt.tables]
            + [np.asarray(r) for r in mt.row_ids]).astype(np.int32)
        fparts = [np.ravel(np.asarray(t.weight)) for t in mt.tables]
        fparts.append(np.asarray(mt.in_degrees))
        if self.d_edge:
            fparts += [np.ravel(np.asarray(t.edge_feat))
                       for t in mt.tables]
        fbuf = np.concatenate(fparts).astype(np.dtype(self.dtype))
        return ibuf, fbuf

    def _unpack_multi(self, ibuf, fbuf) -> MultiTable:
        R, de = self.max_nodes, self.d_edge
        sizes = [rc * bc for rc, bc in zip(self.class_rows, self.classes)]
        off = np.cumsum([0] + sizes)
        tot = int(off[-1])
        tables, row_ids = [], []
        ro = tot
        for ci, (rc, bc) in enumerate(zip(self.class_rows, self.classes)):
            ef = None
            if de:
                efo = tot + R + int(off[ci]) * de
                ef = fbuf[efo:efo + rc * bc * de].reshape(rc, bc, de)
            tables.append(NeighborTable(
                idx=ibuf[int(off[ci]):int(off[ci + 1])].reshape(rc, bc),
                weight=fbuf[int(off[ci]):int(off[ci + 1])].reshape(rc, bc),
                in_degrees=jnp.zeros((rc,), fbuf.dtype),
                edge_feat=ef,
                num_nodes=R, num_recipients=rc, num_edges=0,
                uniform_w=self.assume_uniform_w))
            row_ids.append(ibuf[ro:ro + rc])
            ro += rc
        return MultiTable(tables=tuple(tables), row_ids=tuple(row_ids),
                          in_degrees=fbuf[tot:tot + R],
                          num_nodes=R, num_recipients=R,
                          num_edges=self.max_edges)

    def _fits_envelope(self, g: Graph) -> bool:
        row_ptr = np.asarray(g.row_ptr, np.int64)
        deg = (np.minimum(row_ptr[1:], g.num_edges)
               - np.minimum(row_ptr[:-1], g.num_edges))
        if deg.size and int(deg.max()) > self.classes[-1]:
            return False
        cls_of = np.zeros(deg.shape[0], np.int64)
        for ci, Bc in enumerate(self.classes):
            lo = 0 if ci == 0 else self.classes[ci - 1]
            cls_of[(deg > lo) & (deg <= Bc)] = ci
        cls_of[deg == 0] = 0
        counts = np.bincount(cls_of, minlength=len(self.classes))
        return bool(np.all(counts <= np.asarray(self.class_rows)))

    def warmup(self, d_in: int) -> int:
        """Compile every executable this server can route to, BEFORE
        serving traffic.  Without this the CSR program -- the fallback
        for envelope-overflowing requests -- compiles lazily on the
        first such request, a 20-45 MINUTE stall mid-stream on
        tunnel-class links (BENCH.md 'Online serving').  `d_in` must be
        the real traffic's feature width (executables are keyed on it).
        Dispatches one synthetic request through each path (a star graph
        overflows any degree-class envelope, forcing the CSR route);
        returns the number of compiles performed.  Combine with
        `utils.enable_compilation_cache` so restarts pay ~nothing."""
        before = self.num_compiles()
        X1 = np.zeros((1, d_in), np.float32)
        ef = (np.zeros((1, self.d_edge), np.float32) if self.d_edge
              else None)
        self.predict(np.zeros((2, 1), np.int64), X1, edge_features=ef)
        if self.classes is not None:
            d = min(self.max_nodes - 1, self.max_edges)
            hub = np.zeros(d, np.int64)
            spokes = np.arange(1, d + 1, dtype=np.int64)
            efs = (np.zeros((d, self.d_edge), np.float32) if self.d_edge
                   else None)
            Xs = np.zeros((d + 1, d_in), np.float32)
            fb = self.fallbacks
            self.predict(np.stack([spokes, hub]), Xs, edge_features=efs)
            self.fallbacks = fb                 # synthetic, don't count
        return self.num_compiles() - before

    def predict(self, edge_index, features, edge_features=None) -> np.ndarray:
        """edge_index (2, E), features (N, d_in); returns (N, out_dim).

        The request-sized slice happens on the HOST (np.asarray(out)[:N],
        one fixed-shape D2H of the padded output), never on the device:
        `out[:N]` with a request-dependent N would dispatch a distinct
        tiny slice executable per distinct N -- measured ~400 ms of
        remote-compile per fresh request size, which dominated every
        fresh-size request and was misattributed to per-buffer transfer
        RTTs in round 4 (the server whose path ran FIRST paid all the
        slice compiles; the second reused them)."""
        out, N = self._dispatch(edge_index, features, edge_features)
        return np.asarray(out)[:N]

    def predict_many(self, requests, window: int = 16) -> list:
        """Pipelined batch: dispatch ahead of materialization.  XLA's
        async dispatch then overlaps request k+1's host-side build +
        transfers with the device execution of request k, so throughput
        is not bound by the per-request round-trip the sequential
        `predict` pays (per-request latency is unchanged -- this is the
        throughput mode; measured 3.0x on the HW serving benchmark).
        `window` bounds the number of in-flight requests (device
        buffers): request k-window is materialized before k dispatches,
        so memory stays O(window) instead of O(len(requests)).
        `requests`: iterable of (edge_index, features[, edge_features])
        tuples; returns the list of (N, out_dim) arrays in order."""
        window = max(1, int(window))
        results = []
        pending = []
        for req in requests:
            pending.append(self._dispatch(*req))
            if len(pending) >= window:
                out, N = pending.pop(0)
                results.append(np.asarray(out)[:N])
        for out, N in pending:
            results.append(np.asarray(out)[:N])
        return results

    def _dispatch(self, edge_index, features, edge_features=None):
        """Build + pad + route one request and dispatch the device call
        WITHOUT materializing; returns (device_out, N)."""
        features = np.asarray(features)
        N = features.shape[0]
        E = np.asarray(edge_index).shape[1]
        if N > self.max_nodes:
            raise ValueError(f'{N} nodes > server envelope {self.max_nodes}')
        if E > self.max_edges:
            raise ValueError(f'{E} edges > server envelope {self.max_edges}')
        if (edge_features is None) != (self.d_edge == 0):
            raise ValueError('edge_features presence must match d_edge')
        Xp = np.zeros((self.max_nodes, features.shape[1]),
                      np.dtype(self.dtype))
        Xp[:N] = features
        g = self._pad_graph(edge_index, edge_features)
        if self.classes is not None and self._fits_envelope(g):
            from .graph import to_multi_table
            mt = to_multi_table(g, classes=self.classes,
                                class_rows=self.class_rows, as_numpy=True)
            # uniform_w is DATA-DEPENDENT static metadata (a request with
            # a duplicate edge coalesces to weight 2 -> non-uniform rows);
            # per-request detection would fork the compile cache, so the
            # compiled executable uses the server-level pin
            # `assume_uniform_w`.  When pinned True, VERIFY the host-side
            # detection per request -- serving a non-uniform request
            # through the uniform_w kernel would be silently wrong -- and
            # route mismatches to the always-correct CSR executable.
            if not self.assume_uniform_w or all(
                    t.uniform_w for t in mt.tables):
                ibuf, fbuf = self._pack_multi(mt)
                out = self._call(self._fwd_multi, ibuf, fbuf, Xp)
                return out, N
            self.uniform_w_fallbacks += 1
        elif self.classes is not None:
            self.fallbacks += 1
        ibuf, fbuf = self._pack_csr(g)
        out = self._call(self._fwd, ibuf, fbuf, Xp)
        return out, N

    def _call(self, fwd, ibuf, fbuf, Xp):
        if self._single_buffer:
            return fwd(self.variables,
                       jnp.asarray(self._pack_all(ibuf, fbuf, Xp)))
        return fwd(self.variables, jnp.asarray(Xp, self.dtype),
                   jnp.asarray(ibuf), jnp.asarray(fbuf))

    def num_compiles(self) -> int:
        """Total real XLA compiles across both paths (1 after any number
        of requests that stay on one path).  Monotone by construction:
        each server-owned CountingJit counts its own lower().compile()
        calls instead of introspecting the clearable global jit cache."""
        n = self._fwd.num_compiles
        if self.classes is not None:
            n += self._fwd_multi.num_compiles
        return n
