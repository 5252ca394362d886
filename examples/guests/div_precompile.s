# div_precompile: divides the two input words through the proven
# dummy_div precompile (index 0).  Counterpart of the reference
# `examples/src/bin/precompiles` usage of `use_precompiles!`.
    lw   t0, 0x80(zero)
    lw   t1, 4(t0)           # dividend
    lw   t2, 8(t0)           # divisor
    precompile 0, t3, t1, t2
    lw   t4, 0x84(zero)
    sw   t3, 0(t4)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
