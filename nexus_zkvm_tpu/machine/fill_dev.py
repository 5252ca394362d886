"""Device-side CPU trace fill: step arrays in, committed columns out.

TPU-first replacement for the host-numpy `fill_cpu`
(`machine/cpu.py`): the emulator's SoA step record is shipped to the
device ONCE (bit-packed, ~40 MB at 2^20 instead of the ~350-column
filled trace), and one XLA program derives every CPU main column plus
the lookup-table multiplicity histograms. The reference fills its 347
columns row-by-row on the host (`/root/reference/prover/src/machine.rs:
163-171`); here the host does only cheap masking transforms and the
~500 elementwise column derivations run on the VPU.

Value parity: `fill_cpu_dev` produces EXACTLY the matrix
`CPU_SCHEMA.to_columns(fill_cpu(...))` would give and table counts
equal to `count_multiplicity` over `fill_cpu`'s emit arrays — pinned
by `tests/test_machine.py::test_dev_fill_parity`.

Histogramming uses a compare-broadcast reduction ((values == iota)
summed) instead of scatter-add: measured ~10x faster on TPU for the
~70M emitted table indices of a 2^20 trace.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..vm.isa import Opcode, SyscallCode
from ..ops.field import m31_inv
from .cpu import (CPU_SCHEMA, OP_FLAGS, SYS_FLAGS, _FLAG_IDX,
                  _R_TYPE, _S_TYPE, _B_TYPE, _IMM_C, _LOADS, _CMP_OPS,
                  _SGN_OPS, _SLL_OPS, _SRL_OPS, _SRA_OPS, _WRITE_OPS)

__all__ = ["fill_cpu_dev", "RELATION_SIZES"]

# shipped step-row order (all uint32, length N, padding rows zero)
_ROWS = ["opcode", "rd", "rs1", "rs2", "pc_rel", "npc_rel", "imm",
         "b_val", "c_arr", "a_arr", "a_prev", "d1", "d2", "d3",
         "maddr_m", "wp", "wn", "mtsd"]
_RIDX = {name: i for i, name in enumerate(_ROWS)}

# params row order
_PARAMS = ["prog_start", "exit_code", "heap_start", "st_lo", "st_hi",
           "clk0", "n"]

# table relation -> number of rows (must match machine/tables.py)
RELATION_SIZES = {"r256": 256, "r64": 64, "r128": 128, "r8": 8,
                  "and4": 256, "xor4": 256, "shl8": 9 * 256,
                  "shr8": 8 * 256}


def _np_opset_mask(opc: np.ndarray, ops) -> np.ndarray:
    table = np.zeros(256, bool)
    for o in ops:
        table[int(o)] = True
    return table[opc]


def _host_prep(s, n: int, N: int, view, static_lo, static_hi):
    """Mask/delta transforms on the raw step arrays (host, cheap).

    Zeroing under the same masks the device recomputes keeps the
    bit-packed transfer small (deltas and masked values are tiny on
    typical traces) AND matches fill_cpu's committed values exactly."""
    lay = view.memory_layout
    opc = s["opcode"][:n]
    b_val = s["b_val"][:n].astype(np.uint32)
    is_ecall = opc == int(Opcode.ECALL)
    s_halt = is_ecall & (b_val == int(SyscallCode.EXIT))
    io_write = np.zeros(n, bool)
    for code in (SyscallCode.WRITE, SyscallCode.READ_PRIVATE_INPUT,
                 SyscallCode.OVERWRITE_STACK_POINTER,
                 SyscallCode.OVERWRITE_HEAP_POINTER):
        io_write |= is_ecall & (b_val == int(code))
    writes = _np_opset_mask(opc, _WRITE_OPS) | io_write
    uses_rs2 = _np_opset_mask(opc, _R_TYPE | _S_TYPE | _B_TYPE) \
        | is_ecall
    ls = _np_opset_mask(opc, _LOADS | _S_TYPE)
    is_mem = ls | s_halt
    imm = s["imm"][:n].astype(np.uint32)
    clk = s["clk"][:n].astype(np.uint32)
    c_arr = np.where(uses_rs2, s["c_val"][:n].astype(np.uint32),
                     np.where(_np_opset_mask(opc, _IMM_C), imm, 0))
    prog_start = np.uint32(lay.program_start)

    rows = np.zeros((len(_ROWS), N), np.uint32)

    def put(name, v):
        rows[_RIDX[name], :n] = v

    put("opcode", opc)
    put("rd", s["rd"][:n])
    put("rs1", s["rs1"][:n])
    put("rs2", s["rs2"][:n])
    put("pc_rel", s["pc"][:n].astype(np.uint32) - prog_start)
    put("npc_rel", s["next_pc"][:n].astype(np.uint32) - prog_start)
    put("imm", imm)
    put("b_val", b_val)
    put("c_arr", c_arr)
    put("a_arr", np.where(writes, s["a_val"][:n].astype(np.uint32), 0))
    put("a_prev", np.where(writes, s["a_prev"][:n].astype(np.uint32), 0))
    put("d1", 3 * clk + 1 - s["ts1_prev"][:n].astype(np.uint32) - 1)
    put("d2", np.where(uses_rs2,
                       3 * clk + 2 - s["ts2_prev"][:n].astype(np.uint32)
                       - 1, 0))
    put("d3", np.where(writes,
                       3 * clk + 3 - s["ts3_prev"][:n].astype(np.uint32)
                       - 1, 0))
    put("maddr_m", np.where(ls, s["mem_addr"][:n].astype(np.uint32), 0))
    put("wp", np.where(is_mem,
                       s["mem_prev_val"][:n].astype(np.uint32), 0))
    put("wn", np.where(is_mem, s["mem_new"][:n].astype(np.uint32), 0))
    put("mtsd", np.where(is_mem,
                         clk - s["mem_prev_ts"][:n].astype(np.uint32)
                         - 1, 0))
    clk0 = int(s["clk"][0]) if n else 1
    st_lo = lay.exit_code if static_lo is None else static_lo
    st_hi = lay.exit_code if static_hi is None else static_hi
    params = np.asarray([lay.program_start, lay.exit_code,
                         lay.heap_start, st_lo, st_hi, clk0, n],
                        np.uint32)
    return rows, params


def _hist(idx_list, size: int):
    """Histogram of the given index arrays over [0, size); indices ==
    size (the mask sentinel) are dropped.  Small bin counts use a
    compare-broadcast reduce (no scatter); large tables scatter-add
    into a padded vector — the compare sweep's bins*values product
    dominates there (measured on TPU v5e)."""
    x = jnp.stack(idx_list).astype(jnp.int32)
    flat = x.reshape(-1)
    if size > 256:
        out = jnp.zeros(size + 1, jnp.uint32).at[flat].add(1)
        return out[:size]
    iota = jnp.arange(size, dtype=jnp.int32)
    if flat.shape[0] % 128 == 0 and flat.shape[0] >= 1024:
        m = flat.reshape(-1, 128)
        return (m[:, :, None] == iota[None, None, :]) \
            .astype(jnp.uint32).sum(axis=(0, 1))
    return (flat[:, None] == iota[None, :]).astype(jnp.uint32).sum(0)


def _fill_body(rows, params):
    u32 = jnp.uint32
    N = rows.shape[1]
    g = {name: rows[_RIDX[name]] for name in _ROWS}
    p = {name: params[i] for i, name in enumerate(_PARAMS)}
    n = p["n"]
    valid = jnp.arange(N, dtype=u32) < n
    # padding rows get an unused opcode id so no sel() matches
    opc = jnp.where(valid, g["opcode"], u32(255))

    def sel(ops):
        if isinstance(ops, Opcode):
            return opc == u32(int(ops))
        m = jnp.zeros(N, bool)
        for o in ops:
            m = m | (opc == u32(int(o)))
        return m

    def where(m, a, b=0):
        return jnp.where(m, jnp.asarray(a, u32), jnp.asarray(b, u32))

    f = {}

    def put(name, v, i=None):
        v = jnp.asarray(v, u32)
        if i is None:
            f[name] = v
        else:
            f.setdefault(name, [None] * CPU_SCHEMA.width(name))
            f[name][i] = v

    def bytes4(name, v):
        for i in range(4):
            put(name, (v >> u32(8 * i)) & u32(0xFF), i)

    def limbs(name, v):
        for i in range(4):
            put(name, (v >> u32(8 * i)) & u32(0xFF if i < 3 else 0x3F),
                i)

    # flags
    for op, i in _FLAG_IDX.items():
        put("f", sel(op), i)
    is_ecall = sel(Opcode.ECALL)
    b_val = g["b_val"]
    for name, code in SYS_FLAGS:
        put(name, is_ecall & (b_val == u32(int(code))))
    s_halt = f["s_halt"].astype(bool)
    put("pad", ~valid)

    # core scalars
    clk = where(valid, p["clk0"] + jnp.arange(N, dtype=u32), 0)
    put("clk", clk)
    pc = where(valid, p["prog_start"] + g["pc_rel"], 0)
    npc = where(valid, p["prog_start"] + g["npc_rel"], 0)
    bytes4("pc", pc)
    bytes4("npc", npc)
    imm = g["imm"]
    bytes4("imm", imm)
    rd, rs1, rs2 = g["rd"], g["rs1"], g["rs2"]
    put("opa", where(is_ecall, 10, rd))
    put("opb", rs1)
    r_s_b = sel(_R_TYPE | _S_TYPE | _B_TYPE) | is_ecall
    put("opc", where(r_s_b, rs2, 0))
    reg3 = where(is_ecall, where(f["s_sp"].astype(bool), 2, 10), rd)
    put("reg3", reg3)
    put("nz", reg3 != 0)
    put("inv_a", m31_inv(reg3))

    # values (already write/rs2-masked on the host)
    a_arr, c_arr = g["a_arr"], g["c_arr"]
    bytes4("a", a_arr)
    bytes4("b", b_val)
    bytes4("c", c_arr)
    a_prev = g["a_prev"]
    put("a_prev_lo", a_prev & u32(0xFFFF))
    put("a_prev_hi", a_prev >> u32(16))

    # register timestamps (host shipped the range-checked deltas)
    writes = sel(_WRITE_OPS) | (is_ecall & (
        f["s_write"] | f["s_priv"] | f["s_sp"] | f["s_hp"]
    ).astype(bool))
    uses_rs2 = r_s_b
    d1, d2, d3 = g["d1"], g["d2"], g["d3"]
    put("ts1p", where(valid, 3 * clk - d1, 0))
    limbs("tsd1", d1)
    put("ts2p", where(uses_rs2, 3 * clk + 1 - d2, 0))
    limbs("tsd2", d2)
    put("ts3p", where(writes, 3 * clk + 2 - d3, 0))
    limbs("tsd3", d3)

    # carries
    b_lo, b_hi = b_val & u32(0xFFFF), b_val >> u32(16)
    c_lo, c_hi = c_arr & u32(0xFFFF), c_arr >> u32(16)
    pc_lo, pc_hi = pc & u32(0xFFFF), pc >> u32(16)
    imm_lo, imm_hi = imm & u32(0xFFFF), imm >> u32(16)
    ca1 = jnp.zeros(N, u32)
    ca2 = jnp.zeros(N, u32)
    m = sel(Opcode.ADD) | sel(Opcode.ADDI)
    ca1 = where(m, (b_lo + c_lo) >> u32(16), ca1)
    ca2 = where(m, (b_hi + c_hi + ca1) >> u32(16), ca2)
    m = sel(Opcode.SUB)
    ca1 = where(m, b_lo < c_lo, ca1)
    ca2 = where(m, (b_hi - c_hi - ca1) >> u32(31), ca2)
    m = sel(Opcode.JAL) | sel(Opcode.JALR)
    ca1 = where(m, (pc_lo + 4) >> u32(16), ca1)
    ca2 = where(m, 0, ca2)
    m = sel(Opcode.AUIPC)
    ca1 = where(m, (pc_lo + imm_lo) >> u32(16), ca1)
    ca2 = where(m, (pc_hi + imm_hi + ca1) >> u32(16), ca2)
    is_load = sel(_LOADS)
    is_store = sel(_S_TYPE)
    ls = is_load | is_store
    raw_addr = where(ls, g["maddr_m"], where(s_halt, p["exit_code"], 0))
    bytes4("maddr", raw_addr)
    ca1 = where(ls, (b_lo + imm_lo) >> u32(16), ca1)
    ca2 = where(ls, ((b_hi + imm_hi + ca1) >> u32(16)) & u32(1), ca2)
    put("carry_a", ca1, 0)
    put("carry_a", ca2, 1)

    # compare block
    cmp_on = sel(_CMP_OPS)
    br1 = where(cmp_on, b_lo < c_lo, 0)
    h_lo_raw = (b_lo - c_lo + (br1 << u32(16))) & u32(0xFFFF)
    br2 = where(cmp_on, (b_hi - c_hi - br1) >> u32(31), 0)
    h_hi_raw = (b_hi - c_hi - br1 + (br2 << u32(16))) & u32(0xFFFF)
    h_lo = where(cmp_on, h_lo_raw, 0)
    h_hi = where(cmp_on, h_hi_raw, 0)
    put("br1", br1)
    put("br2", br2)
    put("h", h_lo & u32(0xFF), 0)
    put("h", h_lo >> u32(8), 1)
    put("h", h_hi & u32(0xFF), 2)
    put("h", h_hi >> u32(8), 3)
    e_lo = (h_lo == 0).astype(u32)
    e_hi = (h_hi == 0).astype(u32)
    put("e_lo", e_lo)
    put("e_hi", e_hi)
    put("i_lo", m31_inv(h_lo))
    put("i_hi", m31_inv(h_hi))
    sgn_on = sel(_SGN_OPS)
    b3 = (b_val >> u32(24)) & u32(0xFF)
    c3 = (c_arr >> u32(24)) & u32(0xFF)
    sgn_b = where(sgn_on, b3 >> u32(7), 0)
    sgn_c = where(cmp_on, c3 >> u32(7), 0)
    put("sgn_b", sgn_b)
    put("sgn_c", sgn_c)
    put("b3l7", where(sgn_on, b3 & u32(0x7F), 0))
    put("c3l7", where(cmp_on, c3 & u32(0x7F), 0))
    put("sgn_xor", sgn_b ^ sgn_c)

    # jalr lsb
    jalr = sel(Opcode.JALR)
    lsb = where(jalr, (b_val + imm) & u32(1), 0)
    put("lsb", lsb)

    # carry_pc (int32 arithmetic shifts; values are small)
    i32 = jnp.int32
    eq = e_lo * e_hi
    lt_s = br2 ^ sgn_b ^ sgn_c
    T = (sel(Opcode.BEQ) & (eq == 1)) | (sel(Opcode.BNE) & (eq == 0)) \
        | (sel(Opcode.BLT) & (lt_s == 1)) \
        | (sel(Opcode.BGE) & (lt_s == 0)) \
        | (sel(Opcode.BLTU) & (br2 == 1)) \
        | (sel(Opcode.BGEU) & (br2 == 0)) \
        | sel(Opcode.JAL) | jalr
    base_lo = where(jalr, b_lo, pc_lo).astype(i32)
    base_hi = where(jalr, b_hi, pc_hi).astype(i32)
    lhs_lo = base_lo + where(T, imm_lo, 0).astype(i32) \
        + where(T, 0, 4).astype(i32) - where(s_halt, 4, 0).astype(i32) \
        - lsb.astype(i32)
    cp1 = (lhs_lo - (npc & u32(0xFFFF)).astype(i32)) >> 16
    lhs_hi = base_hi + where(T, imm_hi, 0).astype(i32) + cp1
    cp2 = (lhs_hi - (npc >> u32(16)).astype(i32)) >> 16
    put("carry_pc", cp1.astype(u32), 0)
    put("carry_pc", (cp2 & 1).astype(u32), 1)

    # shift block
    sll_on = sel(_SLL_OPS)
    shr_on = sel(_SRL_OPS | _SRA_OPS)
    sh_on = sll_on | shr_on
    c0 = c_arr & u32(0xFF)
    put("c0q", where(sh_on, c0 >> u32(5), 0))
    sh5 = where(sh_on, c0 & u32(31), 0)
    q_idx = sh5 >> u32(3)
    r = sh5 & u32(7)
    put("sh_r", r)
    for k in range(4):
        put("q", sh_on & (q_idx == k), k)
    bb = [(b_val >> u32(8 * i)) & u32(0xFF) for i in range(4)]
    sh_rem_cols = []
    for i in range(4):
        prod = bb[i] << r
        x = where(sll_on, prod >> u32(8), 0)
        y = where(sll_on, prod & u32(0xFF), 0)
        qv = bb[i] >> r
        x = where(shr_on, qv, x)
        rem = where(shr_on, bb[i] - (qv << r), 0)
        y = where(shr_on, (rem << (u32(8) - r)) & u32(0xFF), y)
        put("sh_x", x, i)
        put("sh_y", y, i)
        put("sh_rem", rem, i)
        sh_rem_cols.append(rem)
    sra_on = sel(_SRA_OPS)
    put("sh_ph", where(sra_on, (u32(1) << (u32(8) - r)) >> u32(8), 0))
    put("sh_p", where(sra_on, (u32(1) << (u32(8) - r)) & u32(0xFF), 0))

    # memory block
    is_mem = ls | s_halt
    m0 = raw_addr & u32(0xFF)
    mem_b = sel({Opcode.LB, Opcode.LBU, Opcode.SB})
    mem_h = sel({Opcode.LH, Opcode.LHU, Opcode.SH})
    put("mq", where(is_mem, m0 >> u32(2), 0))
    ofs = where(is_mem, m0 & u32(3), 0)
    put("mofs", ofs)
    for i in range(4):
        lane = mem_b & (ofs == i)
        if i in (0, 2):
            lane = lane | (mem_h & (ofs == i))
        put("l", lane, i)
    wp, wn = g["wp"], g["wn"]
    bytes4("wp", wp)
    bytes4("wn", wn)
    mtsd = g["mtsd"]
    put("mtsp", where(is_mem, clk - 1 - mtsd, 0))
    limbs("mtsd", mtsd)
    # load sign extraction
    lbh = sel({Opcode.LB, Opcode.LH})
    wp_bytes = [(wp >> u32(8 * i)) & u32(0xFF) for i in range(4)]
    src_b = jnp.zeros(N, u32)
    for i in range(4):
        src_b = where(ofs == i, wp_bytes[i], src_b)
    src_h_hi = where(ofs == 2, wp_bytes[3], wp_bytes[1])
    sign_src = where(sel(Opcode.LB), src_b,
                     where(sel(Opcode.LH), src_h_hi, 0))
    put("ld_s", where(lbh, sign_src >> u32(7), 0))
    put("ld_l7", where(lbh, sign_src & u32(0x7F), 0))
    # region decompositions
    exit_addr, heap = p["exit_code"], p["heap_start"]
    st_lo, st_hi = p["st_lo"], p["st_hi"]
    sm = is_store | s_halt
    above = raw_addr >= exit_addr
    st_sel = where(sm, above, 0)
    srd = where(sm & above, raw_addr - exit_addr, 0)
    in_static = sm & ~above
    srd = where(in_static, raw_addr - st_lo, srd)
    srd2 = where(in_static, st_hi - 1 - raw_addr, 0)
    below = raw_addr < exit_addr
    ls_sel = where(is_load, below, 0)
    srd = where(is_load & below, exit_addr - 1 - raw_addr, srd)
    srd = where(is_load & ~below, raw_addr - heap, srd)
    put("ls_sel", ls_sel)
    put("st_sel", st_sel)
    limbs("srd", srd)
    limbs("srd2", srd2)

    # bitwise nibble-high columns
    and_or = sel({Opcode.AND, Opcode.ANDI, Opcode.OR, Opcode.ORI})
    xor_on = sel({Opcode.XOR, Opcode.XORI})
    bw_on = and_or | xor_on
    cb = [(c_arr >> u32(8 * i)) & u32(0xFF) for i in range(4)]
    ab = [(a_arr >> u32(8 * i)) & u32(0xFF) for i in range(4)]
    for i in range(4):
        put("bh", where(bw_on, bb[i] >> u32(4), 0), i)
        put("ch", where(bw_on, cb[i] >> u32(4), 0), i)
        put("ah", where(bw_on, ab[i] >> u32(4), 0), i)

    # ---------------- assemble the schema matrix ----------------------
    cols = []
    for name, width in CPU_SCHEMA.spec:
        if width == 1:
            cols.append(f[name])
        else:
            assert all(v is not None for v in f[name]), name
            cols.extend(f[name])
    mat = jnp.stack(cols)

    # ---------------- table histograms --------------------------------
    def col(name, i=0):
        return f[name][i] if isinstance(f[name], list) else f[name]

    SENT = {rel: sz for rel, sz in RELATION_SIZES.items()}

    def masked(idx, mask, rel):
        return jnp.where(mask, jnp.asarray(idx, u32),
                         u32(SENT[rel])).astype(jnp.int32)

    r256 = []
    for nm in ("a", "b", "c", "imm", "wp", "wn", "h"):
        r256 += [col(nm, i) for i in range(4)]
    for nm in ("pc", "npc", "maddr"):
        r256 += [col(nm, i) for i in range(3)]
    for nm in ("tsd1", "tsd2", "tsd3", "mtsd", "srd", "srd2"):
        r256 += [col(nm, i) for i in range(3)]
    r64 = [col(nm, 3) for nm in ("pc", "npc", "maddr", "tsd1", "tsd2",
                                 "tsd3", "mtsd", "srd", "srd2")]
    r64.append(col("mq"))
    r128 = [col("ld_l7"), col("b3l7"), col("c3l7")]
    r8 = [masked(col("c0q"), sh_on, "r8")]

    and4, xor4 = [], []
    for i in range(4):
        for part in (lambda v: v >> u32(4), lambda v: v & u32(0xF)):
            and4.append(masked(part(bb[i]) * 16 + part(cb[i]), and_or,
                               "and4"))
            xor4.append(masked(part(bb[i]) * 16 + part(cb[i]), xor_on,
                               "xor4"))
    shl8, shr8 = [], []
    for i in range(4):
        shl8.append(masked(bb[i] * 9 + r, sll_on, "shl8"))
        shl8.append(masked(sh_rem_cols[i] * 9 + (u32(8) - r), shr_on,
                           "shl8"))
        shr8.append(masked(bb[i] * 8 + r, shr_on, "shr8"))
    shl8.append(masked(u32(9) + u32(8) - r, sra_on, "shl8"))

    counts = {
        "r256": _hist(r256, 256),
        "r64": _hist(r64, 64),
        "r128": _hist(r128, 128),
        "r8": _hist(r8, 8),
        "and4": _hist(and4, 256),
        "xor4": _hist(xor4, 256),
        "shl8": _hist(shl8, 9 * 256),
        "shr8": _hist(shr8, 8 * 256),
    }
    return mat, counts


def fill_cpu_dev(trace, view, log_size: int, static_lo=None,
                 static_hi=None):
    """Device CPU fill: returns ((C, N) device uint32 matrix,
    {relation: device count vector}). Matches `fill_cpu` +
    `count_multiplicity` bit for bit."""
    from ..prover.pcs import _ship
    from ..utils.progstore import aot_call
    s = trace.steps
    n = len(s["clk"])
    unimpl = s["opcode"] == int(Opcode.UNIMPL)
    if unimpl.any():
        assert unimpl[np.argmax(unimpl):].all(), \
            "UNIMPL steps must be a trailing block"
        n = int(np.argmax(unimpl))
    N = 1 << log_size
    assert n <= N and log_size <= 28
    opc = s["opcode"][:n]
    present = set(np.unique(opc).tolist())
    supported = {int(o) for o in OP_FLAGS}
    assert present <= supported, \
        f"unsupported opcodes in trace: {present - supported}"
    rows, params = _host_prep(s, n, N, view, static_lo, static_hi)
    rows_dev = _ship(rows)
    return aot_call(("machine.fill_cpu_dev",), _fill_body, rows_dev,
                    jnp.asarray(params))
