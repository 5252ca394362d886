# Is the input word a decimal palindrome? (1/0 to the output.)
# Counterpart of the reference guest `examples/src/bin/palindromes`.
    lw   t0, 0x80(zero)
    lw   t1, 4(t0)           # n
    mv   t2, t1              # n copy
    addi t3, zero, 0         # reversed
    addi t4, zero, 10
rev:
    beq  t2, zero, check
    remu t5, t2, t4          # last digit
    mul  t3, t3, t4
    add  t3, t3, t5
    divu t2, t2, t4
    j    rev
check:
    addi a0, zero, 0
    bne  t3, t1, out
    addi a0, zero, 1
out:
    lw   t6, 0x84(zero)
    sw   a0, 0(t6)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
