# multiply: product of the two public input words (high and low half).
# Counterpart of the reference guest `examples/src/bin/multiply`.
    lw   t0, 0x80(zero)
    lw   t1, 4(t0)           # a
    lw   t2, 8(t0)           # b
    mul  t3, t1, t2          # low 32
    mulhu t4, t1, t2         # high 32
    lw   t5, 0x84(zero)
    sw   t3, 0(t5)
    sw   t4, 4(t5)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
