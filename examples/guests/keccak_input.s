# keccak_input: absorb the public input into the keccak state, permute,
# output the first four state words — the IO + custom-instruction
# combined guest (counterpart of the reference
# `examples/src/bin/io/keccak_input.rs`: hash over user input).
#
# Public input: [n_words, w0, w1, ... ] (n_words <= 50).
# Public output: 4 words of the permuted state.

    lw   s0, 0x80(zero)      # input pointer
    addi s0, s0, 4           # skip byte length
    lw   s1, 0(s0)           # n_words
    addi s0, s0, 4           # -> w0
    addi a7, zero, 0x403     # heap pointer -> a0
    ecall
    mv   s2, a0              # 200-byte state buffer

    # zero the 50-word state
    addi t0, zero, 0
zl: slli t1, t0, 2
    add  t1, s2, t1
    sw   zero, 0(t1)
    addi t0, t0, 1
    addi t2, zero, 50
    bne  t0, t2, zl

    # absorb: state[i] ^= input[i]
    addi t0, zero, 0
    beq  s1, zero, permute
al: slli t1, t0, 2
    add  t2, s0, t1
    lw   t3, 0(t2)
    add  t2, s2, t1
    lw   t4, 0(t2)
    xor  t4, t4, t3
    sw   t4, 0(t2)
    addi t0, t0, 1
    bne  t0, s1, al

permute:
    keccakf x0, s2, x0

    lw   t0, 0x84(zero)      # output pointer
    lw   t1, 0(s2)
    sw   t1, 0(t0)
    lw   t1, 4(s2)
    sw   t1, 4(t0)
    lw   t1, 8(s2)
    sw   t1, 8(t0)
    lw   t1, 12(s2)
    sw   t1, 12(t0)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
