# galeshapley: men-proposing stable matching over 4x4 preference
# matrices (counterpart of the reference guest
# `examples/src/bin/galeshapley.rs` — array-heavy nested-loop control
# flow).  Public input: 32 words — men_pref[4][4] (woman indices in
# preference order) then women_pref[4][4] (man indices).  Public
# output: 4 words, wife_of[m] for m = 0..3.
#
# Heap layout: wrank[4][4] (woman w's rank of man m), next[4] (next
# proposal index per man), husband1[4] (man+1, 0 = free),
# wife1[4] (woman+1, 0 = free).

    lw   s0, 0x80(zero)      # input pointer
    lw   t0, 0(s0)           # byte length (must be 128)
    addi s0, s0, 4           # -> men_pref
    addi a7, zero, 0x403     # heap pointer -> a0
    ecall
    mv   s1, a0              # wrank (64 bytes)
    addi s2, s1, 64          # next[4]
    addi s3, s2, 16          # husband1[4]
    addi s4, s3, 16          # wife1[4]

    # zero next/husband1/wife1
    addi t0, zero, 0
zl: slli t1, t0, 2
    add  t2, s2, t1
    sw   zero, 0(t2)
    add  t2, s3, t1
    sw   zero, 0(t2)
    add  t2, s4, t1
    sw   zero, 0(t2)
    addi t0, t0, 1
    slti t2, t0, 4
    bne  t2, zero, zl

    # build wrank[w][m] = k where women_pref[w][k] == m
    addi t0, zero, 0         # w
bw: addi t1, zero, 0         # k
bk: slli t2, t0, 4           # w*16
    slli t3, t1, 2           # k*4
    add  t2, t2, t3
    addi t2, t2, 64          # women_pref offset
    add  t2, t2, s0
    lw   t4, 0(t2)           # m = women_pref[w][k]
    slli t5, t0, 4
    slli t4, t4, 2
    add  t5, t5, t4
    add  t5, t5, s1
    sw   t1, 0(t5)           # wrank[w][m] = k
    addi t1, t1, 1
    slti t2, t1, 4
    bne  t2, zero, bk
    addi t0, t0, 1
    slti t2, t0, 4
    bne  t2, zero, bw

mloop:
    # find a free man
    addi t0, zero, 0
scan:
    slli t1, t0, 2
    add  t1, t1, s4
    lw   t2, 0(t1)           # wife1[m]
    beq  t2, zero, prop
    addi t0, t0, 1
    slti t2, t0, 4
    bne  t2, zero, scan
    j    emit                # everyone matched

prop:                        # man m = t0 proposes
    slli t1, t0, 2
    add  t1, t1, s2
    lw   t2, 0(t1)           # k = next[m]
    addi t3, t2, 1
    sw   t3, 0(t1)           # next[m] = k+1
    slli t3, t0, 4           # m*16
    slli t2, t2, 2
    add  t3, t3, t2
    add  t3, t3, s0
    lw   t4, 0(t3)           # w = men_pref[m][k]
    slli t5, t4, 2
    add  t5, t5, s3
    lw   t6, 0(t5)           # husband1[w]
    beq  t6, zero, engage
    # w is engaged to cur = t6-1: compare ranks
    addi t6, t6, -1          # cur
    slli a1, t4, 4           # w*16
    slli a2, t0, 2
    add  a2, a2, a1
    add  a2, a2, s1
    lw   a3, 0(a2)           # wrank[w][m]
    slli a2, t6, 2
    add  a2, a2, a1
    add  a2, a2, s1
    lw   a4, 0(a2)           # wrank[w][cur]
    blt  a3, a4, steal
    j    mloop                # rejected; m stays free

steal:                       # w dumps cur (t6) for m (t0)
    slli a1, t6, 2
    add  a1, a1, s4
    sw   zero, 0(a1)         # wife1[cur] = 0
engage:
    slli a1, t4, 2
    add  a1, a1, s3
    addi a2, t0, 1
    sw   a2, 0(a1)           # husband1[w] = m+1
    slli a1, t0, 2
    add  a1, a1, s4
    addi a2, t4, 1
    sw   a2, 0(a1)           # wife1[m] = w+1
    j    mloop

emit:
    lw   t0, 0x84(zero)      # output pointer
    addi t1, zero, 0
eo: slli t2, t1, 2
    add  t3, t2, s4
    lw   t4, 0(t3)           # wife1[m]
    addi t4, t4, -1
    add  t3, t2, t0
    sw   t4, 0(t3)
    addi t1, t1, 1
    slti t2, t1, 4
    bne  t2, zero, eo

    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
