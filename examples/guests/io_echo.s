# io_echo: copy every public-input word to the public output —
# the guest side of the typed-IO matrix (u64/u128/struct round trips
# are word sequences on the tape; counterpart of the reference's
# io_u32/u64/u128 integration tests, tests/integration-tests/).
    lw   t0, 0x80(zero)
    lw   t1, 0(t0)           # byte length
    srli t1, t1, 2           # word count
    lw   t5, 0x84(zero)      # output pointer
    beq  t1, zero, done
loop:
    addi t0, t0, 4
    lw   t4, 0(t0)
    sw   t4, 0(t5)
    addi t5, t5, 4
    addi t1, t1, -1
    bne  t1, zero, loop
done:
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
