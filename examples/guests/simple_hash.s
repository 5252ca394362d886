# simple_hash: FNV-1a over the public input words.
# Counterpart of the reference guest `examples/src/bin/simple_hash`.
    lw   t0, 0x80(zero)
    lw   t1, 0(t0)
    srli t1, t1, 2
    li   t2, 0x811C9DC5      # FNV offset basis
    li   t5, 0x01000193      # FNV prime
    beq  t1, zero, done
loop:
    addi t0, t0, 4
    lw   t4, 0(t0)
    xor  t2, t2, t4
    mul  t2, t2, t5
    addi t1, t1, -1
    bne  t1, zero, loop
done:
    lw   t6, 0x84(zero)
    sw   t2, 0(t6)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
