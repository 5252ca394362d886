# keccak: permute a zero state n times, output the first two words.
# Counterpart of the reference guest `examples/src/bin/keccak`.
    lw   t0, 0x80(zero)
    lw   t1, 4(t0)           # n permutations
    addi a7, zero, 0x403     # heap pointer -> a0
    ecall
    mv   t2, a0              # 200-byte state buffer on the heap
    beq  t1, zero, done
loop:
    keccakf x0, t2, x0
    addi t1, t1, -1
    bne  t1, zero, loop
done:
    lw   t3, 0(t2)
    lw   t4, 4(t2)
    lw   t5, 0x84(zero)
    sw   t3, 0(t5)
    sw   t4, 4(t5)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
