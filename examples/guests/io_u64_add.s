# io_u64_add: read two u64s (2 words each, lo first), add them with an
# explicit carry (RV32 add/sltu), output the u64 sum — the in-guest
# multi-word arithmetic analogue of the reference io_u64 test.
    lw   t0, 0x80(zero)
    lw   a0, 4(t0)           # x lo
    lw   a1, 8(t0)           # x hi
    lw   a2, 12(t0)          # y lo
    lw   a3, 16(t0)          # y hi
    add  t1, a0, a2          # lo sum
    sltu t2, t1, a0          # carry out
    add  t3, a1, a3
    add  t3, t3, t2          # hi sum
    lw   t5, 0x84(zero)
    sw   t1, 0(t5)
    sw   t3, 4(t5)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
