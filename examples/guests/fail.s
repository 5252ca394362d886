# fail: exits with a nonzero code (failure-path guest).
# Counterpart of the reference guest `examples/src/bin/fail`.
    addi a0, zero, 1
    addi a7, zero, 0x201
    ecall
