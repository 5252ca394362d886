"""Polynomial commitment scheme: LDE + Merkle forests per role.

Counterpart of stwo's ``CommitmentSchemeProver`` / ``tree_builder``
(`/root/reference/prover/src/machine.rs:202-263`). Differences by
design (TPU-first):

* one Merkle tree per (role, eval-domain size) instead of one
  mixed-size tree per role — query openings then live at uniform
  positions ``{p, p^1}`` whose paths shrink ``q >> 1`` per FRI fold,
  and each tree commit is a stack of equal-length rows (one batched
  Blake2s kernel per layer, no mixed-depth injection);
* committed order is bit-reversed layout (see `ops/circle.py`);
* all column data lives in (C, N) device MATRICES end to end —
  per-column python lists would give XLA graphs with thousands of
  parameters and saturate a tunneled device link with transfers.

Columns enter in **natural row order** (numpy) and stay on device as
(coeff batches, committed eval matrices, trees).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import cfft, merkle
from ..ops.circle import (
    bit_reverse_indices, natural_to_layout, layout_to_natural,
    dev_bit_reverse, dev_layout_to_natural,
)
from ..parallel.context import shard_rows

__all__ = ["RoleCommitment", "commit_columns", "commit_from_coeffs",
           "open_positions"]


@dataclass
class RoleCommitment:
    role: str
    trace_logs: list          # per column (plan order within role)
    log_blowup: int
    coeff_batches: dict       # n -> (col index list, (Cn, 2^n) device)
    evals: dict               # eval_log -> (C, 2^s) device, committed
    cols_by_size: dict        # eval_log -> [column indices], plan order
    trees: dict               # eval_log -> merkle.MerkleTree
    natural: dict = None      # n -> (col index list, (Cn, 2^n) device)

    def sizes_desc(self):
        return sorted(self.trees, reverse=True)

    def roots(self):
        if getattr(self, "_roots_cache", None) is None:
            self._roots_cache = [(s, np.asarray(self.trees[s].root()))
                                 for s in self.sizes_desc()]
        return self._roots_cache

    def mix_roots(self, channel):
        for s, root in self.roots():
            channel.mix_u32s(root)

    def coeff_rows(self, col_idxs):
        """(len(col_idxs), 2^n) device batch (all same trace size)."""
        return self._rows(self.coeff_batches, col_idxs)

    def natural_rows(self, col_idxs):
        """Natural-order trace values, device (no re-transfer)."""
        assert self.natural, "natural batches not retained"
        return self._rows(self.natural, col_idxs)

    def _rows(self, batches, col_idxs):
        ns = {self.trace_logs[i] for i in col_idxs}
        assert len(ns) == 1
        n = ns.pop()
        idxs, batch = batches[n]
        rowmap = {ci: r for r, ci in enumerate(idxs)}
        sel = [rowmap[i] for i in col_idxs]
        if sel == list(range(int(batch.shape[0]))):
            return batch, n        # identity: no gather copy (GBs at 2^20)
        rows = jnp.asarray(np.asarray(sel, np.int64))
        return batch[rows], n

    def evals_natural_matrix(self, col_idxs, eval_log: int):
        """(C, 2^eval_log) natural-order eval matrix (device)."""
        if not col_idxs:
            return None
        batch, n = self.coeff_rows(col_idxs)
        assert eval_log >= n
        ev = cfft.evaluate(batch, eval_log)
        return ev[:, jnp.asarray(natural_to_layout(eval_log))]

    def evals_natural_many(self, col_idxs, eval_log: int):
        ev = self.evals_natural_matrix(col_idxs, eval_log)
        return [] if ev is None else [ev[j] for j in range(ev.shape[0])]

    def evals_natural(self, col_idx: int, eval_log: int):
        return self.evals_natural_many([col_idx], eval_log)[0]

    def open(self, positions_by_size: dict):
        """[(eval_log, MerkleDecommitment)] descending by size."""
        return [(s, merkle.decommit(self.trees[s], positions_by_size[s]))
                for s in self.sizes_desc()]

    def open_async(self, positions_by_size: dict):
        """[(eval_log, PendingDecommitment)] — no host sync; finalize
        many roles' openings together (`merkle.finalize_decommitments`)."""
        return [(s, merkle.decommit_async(self.trees[s],
                                          positions_by_size[s]))
                for s in self.sizes_desc()]


def _lde_climb_body(batch, brev, s: int):
    """Coeff batch (C, 2^n) -> (evals committed (C, 2^s), [layers])."""
    from ..ops.blake2s import batch_blake2s_words
    ev = cfft.evaluate(batch, s)                      # layout order
    ev = ev[:, brev]                                  # committed order
    layers = []
    below = batch_blake2s_words(ev.T)                 # leaf layer (2^s, 8)
    layers.append(below)
    for dd in range(s - 1, -1, -1):
        below = batch_blake2s_words(below.reshape(1 << dd, 16))
        layers.append(below)
    return ev, layers


def _fused_lde_commit(batch, n: int, s: int):
    """One stored AOT program per (shape, s): LDE + bit-reverse +
    every Merkle layer — a single device dispatch per size group
    instead of ~3 + depth/8.  XLA:CPU chokes on the long chained-hash
    graph, so the CPU backend keeps the split path."""
    import jax
    import os
    from ..utils.progstore import aot_call
    from ..parallel.context import active_mesh
    force = os.environ.get("NZT_FUSE_COMMIT")     # "1" force / "0" off
    if force == "0" or active_mesh() is not None or (
            force != "1" and jax.default_backend() == "cpu"):
        return None
    import functools
    ev, layers = aot_call(("pcs.lde_climb", s),
                          functools.partial(_lde_climb_body, s=s),
                          batch, dev_bit_reverse(s))
    tree = merkle.MerkleTree(layers=list(reversed(layers)), columns=[],
                             by_depth={s: list(range(batch.shape[0]))},
                             matrix=ev)
    return ev, tree


_UPD_JIT: dict = {}


def _donated_set_rows(buf, chunk, lo: int):
    """buf[lo:lo+k] = chunk with the buffer DONATED — an in-place
    row-block write on device (no second multi-GB allocation), used to
    assemble large batches incrementally."""
    import jax
    key = (tuple(buf.shape), tuple(chunk.shape), lo, str(buf.dtype))
    f = _UPD_JIT.get(key)
    if f is None:
        f = jax.jit(lambda b, c: jax.lax.dynamic_update_slice(
            b, c, (lo, 0)), donate_argnums=(0,))
        _UPD_JIT[key] = f
    return f(buf, chunk)


def _interpolate_big(dev, n: int, chunk_rows: int = 32,
                     in_place: bool = False):
    """Column-chunked interpolation into a donated coefficient buffer:
    peak extra memory is one chunk's working set instead of a second
    full-size matrix.

    `in_place=True` reuses `dev`'s own buffer as the output (each
    chunk reads rows not yet overwritten, then writes them back via a
    donated update), so the natural-order matrix and the coefficient
    matrix never coexist — the caller must not use `dev` afterwards.
    Used when the commitment does not keep natural-order values
    (interaction trees at 2^22+, where a second full-size buffer is
    the difference between fitting in HBM and OOM)."""
    from ..ops import cfft as _cfft
    from ..utils.progstore import aot_call
    C = int(dev.shape[0])
    buf = dev if in_place else jnp.zeros((C, 1 << n), jnp.uint32)

    def body(x, idx):
        return _cfft.interpolate(x[:, idx])

    for ci, lo in enumerate(range(0, C, chunk_rows)):
        src = buf if in_place else dev
        cc = aot_call(("pcs.interp_chunk", n), body,
                      src[lo: lo + chunk_rows], dev_layout_to_natural(n))
        buf = _donated_set_rows(buf, cc, lo)
        if ci % 4 == 3 or in_place:
            # bound the in-flight working set: async dispatch would
            # otherwise keep every pending chunk's buffers live at once
            buf.block_until_ready()
    return buf


def _stream_threshold() -> int:
    """Eval matrices above this byte size are committed in column
    chunks and NOT kept resident (quotients/openings recompute from
    coefficients) — the 2^22+ single-chip memory mode."""
    import os
    return int(os.environ.get("NZT_STREAM_COMMIT_BYTES",
                              str(2 << 30)))


def _stream_chunk_cols(s: int) -> int:
    """Column-chunk width for streamed (recompute-from-coefficients)
    passes: sized so one chunk's LDE working set stays ~0.5 GB at any
    s — at 2^23 rows a 64-col chunk peaks at ~5 GB inside the program,
    which is what OOMed the first 2^22 run.  Multiples of 16 keep the
    streamed Blake2s digests chunk-size invariant."""
    import os
    budget = int(os.environ.get("NZT_STREAM_CHUNK_BYTES",
                                str(1 << 28)))
    return max(16, min(64, (budget // (4 << s)) & ~15))


def _stream_commit(batch, n: int, s: int, chunk_cols: int = 0):
    """Column-streamed LDE + Merkle commit: leaf digests are built by
    carrying the Blake2s state across column chunks (each chunk = a
    whole number of 16-word message blocks), so the (C, 2^s) eval
    matrix never exists at once.  Root/digest-identical to
    `merkle.commit_matrix(evaluate(batch)[:, brev])`."""
    import functools
    import os
    from ..utils.progstore import aot_call
    from ..ops.blake2s import batch_compress, initial_state
    if not chunk_cols:
        chunk_cols = _stream_chunk_cols(s)
    assert chunk_cols % 16 == 0
    C = int(batch.shape[0])
    M = 1 << s
    nbytes_msg = 4 * C

    def run_blocks(state, msg, c, done, last):
        nb = -(-c // 16) if last else c // 16
        for b in range(nb):
            blk = msg[:, 16 * b: 16 * (b + 1)]
            pad = 16 - int(blk.shape[1])
            if pad:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((M, pad), jnp.uint32)], axis=1)
            final = last and b == nb - 1
            t = nbytes_msg if final else 4 * (done + 16 * (b + 1))
            state = batch_compress(state, blk, t, final)
        return state

    state = None
    done = 0
    while done < C:
        c = min(chunk_cols, C - done)
        last = done + c == C

        def body0(chunk, brev, _c=c, _last=last):
            ev = cfft.evaluate(chunk, s)[:, brev]
            st = jnp.broadcast_to(jnp.asarray(initial_state()), (M, 8))
            return run_blocks(st, ev.T, _c, 0, _last)

        def bodyn(st, chunk, brev, dd, _c=c, _last=last):
            ev = cfft.evaluate(chunk, s)[:, brev]
            return run_blocks(st, ev.T, _c, dd, _last)

        chunk = batch[done: done + c]
        brev = dev_bit_reverse(s)
        if state is None:
            state = aot_call(("pcs.stream_leaf0", s, c, last, C),
                             body0, chunk, brev)
        else:
            # the byte counter rides in as a traced scalar so every
            # middle chunk shares ONE stored program (the final chunk
            # bakes nbytes_msg, hence its own key)
            key = (("pcs.stream_leafF", s, c, C) if last
                   else ("pcs.stream_leaf", s, c))
            state = aot_call(key, bodyn, state, chunk, brev,
                             np.uint64(done))
        done += c
        if s >= 22 or (done // chunk_cols) % 4 == 0:
            state.block_until_ready()      # bound in-flight LDE chunks

    # climb from the leaf digests (fused blocks, as commit_matrix)
    layers = [None] * (s + 1)
    layers[s] = state
    x, top = state, s - 1
    blk_n = merkle._climb_block_size()
    while top >= 0:
        n_blk = min(blk_n, top + 1)
        out = merkle._climb_block(False, top, n_blk)(x)
        for i, arr in enumerate(out):
            layers[top - i] = arr
        x = out[-1]
        top -= n_blk
    return merkle.MerkleTree(layers=layers, columns=[],
                             by_depth={s: list(range(C))}, matrix=None)


def _commit_groups(role, trace_logs, coeff_batches, log_blowup):
    from ..parallel.context import active_mesh
    cols_by_size, evals, trees = {}, {}, {}
    for i in range(len(trace_logs)):
        s = trace_logs[i] + log_blowup
        cols_by_size.setdefault(s, []).append(i)
    for s, idxs in sorted(cols_by_size.items(), reverse=True):
        n = s - log_blowup
        b_idxs, batch = coeff_batches[n]
        assert b_idxs == idxs
        nbytes = len(idxs) * (1 << s) * 4
        if nbytes > _stream_threshold() and active_mesh() is None:
            trees[s] = _stream_commit(batch, n, s)
            evals[s] = None                # recompute-on-demand mode
            continue
        fused = _fused_lde_commit(batch, n, s)
        if fused is not None:
            evals[s], trees[s] = fused
            continue
        ev = cfft.evaluate(batch, s)                      # layout order
        ev = ev[:, dev_bit_reverse(s)]                    # committed
        evals[s] = ev
        trees[s] = merkle.commit_matrix(ev)
    return RoleCommitment(role=role, trace_logs=list(trace_logs),
                          log_blowup=log_blowup,
                          coeff_batches=coeff_batches,
                          evals=evals, cols_by_size=cols_by_size,
                          trees=trees)


def opened_values_streamed(rc: "RoleCommitment", s: int, positions,
                           chunk_cols: int = 0):
    """(C, Q) opened values of a STREAMED tree, recomputed from the
    coefficient batch by column-chunked LDE + position gather."""
    from ..utils.progstore import aot_call
    from ..utils.devcache import dev_const
    if not chunk_cols:
        chunk_cols = _stream_chunk_cols(s)
    n = s - rc.log_blowup
    _idxs, batch = rc.coeff_batches[n]
    pos = np.asarray(sorted(set(int(p) for p in positions)), np.int64)
    idx = dev_const(("pcs.open_idx", s, tuple(pos.tolist())),
                    lambda: bit_reverse_indices(s)[pos]
                    .astype(np.int32))

    def body(chunk, idx):
        return cfft.evaluate(chunk, s)[:, idx]

    C = int(batch.shape[0])
    outs = []
    for lo in range(0, C, chunk_cols):
        out = aot_call(("pcs.stream_open", s, len(pos)), body,
                       batch[lo: lo + chunk_cols], idx)
        if s >= 22:
            out.block_until_ready()   # bound in-flight LDE chunks
        outs.append(out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _ship(batch: np.ndarray):
    """Host (C, M) uint32 -> device uint32 across a ~25 MB/s tunnel.

    Remote backends get width-bucketed bit packing (`_ship_packed`,
    ~10x fewer bytes than uint32 for machine traces: flags are 1 bit,
    byte limbs 8); the local CPU backend skips the packing work."""
    import jax
    import os
    from ..utils.profile import scope as _scope
    with _scope("ship"):
        return _ship_inner(batch)


def _ship_inner(batch: np.ndarray):
    import jax
    import os
    force = os.environ.get("NZT_PACK_SHIP")
    if force == "0" or (force != "1" and
                        jax.default_backend() == "cpu"):
        hi = int(batch.max()) if batch.size else 0
        if hi < (1 << 8):
            small = batch.astype(np.uint8)
        elif hi < (1 << 16):
            small = batch.astype(np.uint16)
        else:
            small = batch
        return jnp.asarray(small).astype(jnp.uint32)
    return _ship_packed(batch)


_PACK_WIDTHS = (1, 2, 4, 8, 16, 32)


def _ship_packed(batch: np.ndarray):
    """Bit-packed host->device transfer: columns are bucketed by bit
    width (1/2/4/8/16/32), each bucket packs 32/w values per uint32
    word along the row axis, and ONE device program unpacks + restores
    caller row order.  Value-exact with a plain uint32 transfer."""
    from ..utils.progstore import aot_call
    batch = np.ascontiguousarray(np.asarray(batch, np.uint32))
    C, M = batch.shape
    if C == 0 or M < 32:
        return jnp.asarray(batch)
    M_orig = M
    if M % 32:
        batch = np.concatenate(
            [batch, np.zeros((C, 32 - M % 32), np.uint32)], axis=1)
        M = batch.shape[1]
    col_w = []
    for i in range(C):
        w = max(1, int(batch[i].max()).bit_length())
        col_w.append(next(b for b in _PACK_WIDTHS if w <= b))
    packed, order = {}, []
    for w in _PACK_WIDTHS:
        idxs = [i for i in range(C) if col_w[i] == w]
        if not idxs:
            continue
        sub = batch[idxs]
        order.extend(idxs)
        if w == 32:
            packed[str(w)] = jnp.asarray(sub)
        else:
            k = 32 // w
            v = sub.reshape(len(idxs), M // k, k)
            out = np.zeros((len(idxs), M // k), np.uint32)
            for j in range(k):
                out |= v[:, :, j] << np.uint32(w * j)
            packed[str(w)] = jnp.asarray(out)
    perm = np.empty(C, np.int32)
    perm[np.asarray(order, np.int32)] = np.arange(C, dtype=np.int32)

    def unpack(packed, perm):
        outs = []
        for w in _PACK_WIDTHS:
            if str(w) not in packed:
                continue
            p = packed[str(w)]
            if w == 32:
                outs.append(p)
                continue
            k = 32 // w
            sh = (jnp.uint32(w) *
                  jnp.arange(k, dtype=jnp.uint32))[None, None, :]
            x = (p[:, :, None] >> sh) & jnp.uint32((1 << w) - 1)
            outs.append(x.reshape(p.shape[0], -1))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out[perm]

    out = aot_call("pcs.unpack", unpack, packed, jnp.asarray(perm))
    return out[:, :M_orig] if M_orig != M else out


def commit_columns(role: str, columns, trace_logs, log_blowup: int,
                   keep_natural: bool = True) -> RoleCommitment:
    """columns: natural-order numpy uint32 arrays of sizes
    2^trace_logs[i] (host); stacked per size on the host, shipped to
    device ONCE (downcast transfer), reordered and interpolated on
    device.  The natural-order device copy is retained for interaction
    generation (no second transfer of the main trace)."""
    by_n = {}
    for i, n in enumerate(trace_logs):
        by_n.setdefault(n, []).append(i)
    coeff_batches, natural = {}, {}
    for n, idxs in by_n.items():
        cols_n = [columns[i] for i in idxs]
        if all(isinstance(c, np.ndarray) for c in cols_n):
            dev = _ship(np.stack([c.astype(np.uint32)
                                  for c in cols_n]))
        else:
            # already device-resident (e.g. interaction columns) --
            # never bounce them through the host
            dev = jnp.stack([jnp.asarray(c, jnp.uint32)
                             for c in cols_n])
        from ..parallel.context import active_mesh
        dev = shard_rows(dev)      # active mesh: rows over devices
        if keep_natural:
            natural[n] = (idxs, dev)
        if dev.size * 4 > _stream_threshold() and active_mesh() is None:
            cf = _interpolate_big(dev, n)
        else:
            cf = cfft.interpolate(dev[:, dev_layout_to_natural(n)])
        coeff_batches[n] = (idxs, cf)
    rc = _commit_groups(role, trace_logs, coeff_batches, log_blowup)
    rc.natural = natural
    return rc


def commit_blocks(role: str, blocks, block_logs, log_blowup: int,
                  keep_natural: bool = True) -> RoleCommitment:
    """Commit pre-stacked column blocks: blocks[i] is a (k_i, 2^n_i)
    matrix (device or numpy) whose rows are consecutive committed
    columns.  Equivalent to `commit_columns` over the flattened rows,
    but device blocks enter whole — no per-column slice dispatches
    (each would cost a round trip on a tunneled link)."""
    idx = 0
    by_n, trace_logs = {}, []
    for b, n in zip(blocks, block_logs):
        k = int(b.shape[0])
        by_n.setdefault(n, []).append(b)
        trace_logs += [n] * k
        idx += k
    # global column indices in caller order, grouped per size
    idxs_by_n = {}
    pos = 0
    for b, n in zip(blocks, block_logs):
        k = int(b.shape[0])
        idxs_by_n.setdefault(n, []).extend(range(pos, pos + k))
        pos += k
    del b
    if isinstance(blocks, list):
        blocks.clear()          # ownership: by_n holds the only refs
    from ..parallel.context import active_mesh
    coeff_batches, natural = {}, {}
    import os as _os
    _dbg = _os.environ.get("NZT_MEM_DEBUG")
    for n, mats in by_n.items():
        C_tot = sum(int(m.shape[0]) for m in mats)
        big = (C_tot * (1 << n) * 4 > _stream_threshold()
               and active_mesh() is None)
        if _dbg:
            print(f"[commit:{role}] n={n} C={C_tot} "
                  f"bytes={C_tot * (1 << n) * 4} big={big}",
                  flush=True)
        if all(isinstance(m, np.ndarray) for m in mats):
            # host side: one stacked downcast transfer for the size
            dev = _ship(np.concatenate(mats) if len(mats) > 1
                        else mats[0])
        elif big and len(mats) > 1:
            # assemble the size group into ONE donated buffer, freeing
            # each source block as it lands (peak = buf + one block
            # instead of 2x the group)
            dev = jnp.zeros((C_tot, 1 << n), jnp.uint32)
            lo = 0
            for mi in range(len(mats)):
                m = mats[mi]
                m = _ship(m) if isinstance(m, np.ndarray) \
                    else jnp.asarray(m, jnp.uint32)
                dev = _donated_set_rows(dev, m, lo)
                lo += int(m.shape[0])
                mats[mi] = None
                del m
                dev.block_until_ready()   # free the source before the next
            by_n[n] = None
        else:
            mats = [_ship(m) if isinstance(m, np.ndarray)
                    else jnp.asarray(m, jnp.uint32) for m in mats]
            dev = mats[0] if len(mats) == 1 else jnp.concatenate(mats)
            by_n[n] = None         # release source blocks
            del mats
        dev = shard_rows(dev)
        if keep_natural:
            natural[n] = (idxs_by_n[n], dev)
        if big:
            # without keep_natural the natural matrix is dead after
            # interpolation — reuse its buffer (halves the peak)
            cf = _interpolate_big(dev, n,
                                  in_place=not keep_natural)
            if not keep_natural:
                dev = None
        else:
            cf = cfft.interpolate(dev[:, dev_layout_to_natural(n)])
        coeff_batches[n] = (idxs_by_n[n], cf)
    rc = _commit_groups(role, trace_logs, coeff_batches, log_blowup)
    rc.natural = natural
    return rc


def commit_from_coeffs(role: str, coeffs, trace_logs, log_blowup: int
                       ) -> RoleCommitment:
    by_n = {}
    for i, n in enumerate(trace_logs):
        by_n.setdefault(n, []).append(i)
    coeff_batches = {}
    for n, idxs in by_n.items():
        coeff_batches[n] = (idxs, shard_rows(jnp.stack(
            [jnp.asarray(coeffs[i]) for i in idxs])))
    return _commit_groups(role, trace_logs, coeff_batches, log_blowup)


def open_positions(queries, s0: int, s: int):
    """Sorted opened positions {p, p^1}, p = q >> (s0 - s)."""
    out = set()
    for q in queries:
        p = int(q) >> (s0 - s)
        out.add(p)
        out.add(p ^ 1)
    return sorted(out)
