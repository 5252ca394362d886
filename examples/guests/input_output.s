# input_output: echoes each public input word doubled to the output.
# Counterpart of the reference guest `examples/src/bin/io/input_output`.
    lw   t0, 0x80(zero)      # input pointer
    lw   t1, 0(t0)           # byte length of the input
    srli t1, t1, 2           # word count
    lw   t2, 0x84(zero)      # output pointer
    addi t3, zero, 0         # index
    beq  t1, zero, done
loop:
    addi t0, t0, 4
    lw   t4, 0(t0)
    add  t4, t4, t4
    sw   t4, 0(t2)
    addi t2, t2, 4
    addi t3, t3, 1
    bne  t3, t1, loop
done:
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
