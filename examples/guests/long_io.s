# long_io: checksum (sum + xor) over a long public input tape.
# Counterpart of the reference guest `examples/src/bin/io/long_io`.
    lw   t0, 0x80(zero)
    lw   t1, 0(t0)           # byte length
    srli t1, t1, 2           # word count
    addi t2, zero, 0         # sum
    addi t3, zero, 0         # xor
    beq  t1, zero, done
loop:
    addi t0, t0, 4
    lw   t4, 0(t0)
    add  t2, t2, t4
    xor  t3, t3, t4
    addi t1, t1, -1
    bne  t1, zero, loop
done:
    lw   t5, 0x84(zero)
    sw   t2, 0(t5)
    sw   t3, 4(t5)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
