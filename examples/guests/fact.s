# fact(n): factorial of the public input word (M-extension MUL).
# Counterpart of the reference guest `examples/src/bin/fact`.
    lw   t0, 0x80(zero)      # public input pointer
    lw   t1, 4(t0)           # n
    addi a0, zero, 1
    beq  t1, zero, done
loop:
    mul  a0, a0, t1
    addi t1, t1, -1
    bne  t1, zero, loop
done:
    lw   t2, 0x84(zero)
    sw   a0, 0(t2)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
