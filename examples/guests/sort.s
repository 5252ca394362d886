# sort: bubble-sorts the input words on the heap, writes them back —
# a load/store-heavy workload (plays the role of the reference's
# memory-bound guests like palindromes/galeshapley).
    lw   t0, 0x80(zero)
    lw   t1, 0(t0)           # byte length
    srli t1, t1, 2           # n words
    addi a7, zero, 0x403     # heap -> a0
    ecall
    mv   t2, a0
    # copy input words to heap
    addi t3, zero, 0
    mv   t4, t2
    beq  t1, zero, emit
copy:
    addi t0, t0, 4
    lw   t5, 0(t0)
    sw   t5, 0(t4)
    addi t4, t4, 4
    addi t3, t3, 1
    bne  t3, t1, copy
    # bubble sort
    addi s0, t1, -1          # passes = n-1
    beq  s0, zero, emit
pass:
    addi t3, zero, 0         # i
    mv   t4, t2
inner:
    lw   t5, 0(t4)
    lw   t6, 4(t4)
    bgeu t6, t5, noswap
    sw   t6, 0(t4)
    sw   t5, 4(t4)
noswap:
    addi t4, t4, 4
    addi t3, t3, 1
    bne  t3, s0, inner
    addi s0, s0, -1
    bne  s0, zero, pass
emit:
    # write sorted words to the public output
    lw   t4, 0x84(zero)
    addi t3, zero, 0
    mv   t5, t2
    beq  t1, zero, done
out:
    lw   t6, 0(t5)
    sw   t6, 0(t4)
    addi t4, t4, 4
    addi t5, t5, 4
    addi t3, t3, 1
    bne  t3, t1, out
done:
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
