# interp: a stack-machine bytecode interpreter — the irregular
# control-flow / dispatch-heavy workload class of the reference guest
# `examples/src/bin/lambda_calculus.rs` (an interpreter over heap
# structures with data-dependent branching).
#
# Public input: words [n_ops, op0, op1, ...] where each op word is
#   opcode | (imm << 8):
#     0 PUSH imm   push imm
#     1 ADD        pop b, a; push a+b
#     2 SUB        pop b, a; push a-b
#     3 MUL        pop b, a; push a*b (low 32)
#     4 DUP        push top
#     5 SWAP       swap top two
#     6 JNZ imm    pop c; if c != 0 jump to op index imm
#     7 HALT       stop
# Public output: 2 words — final stack depth, top of stack (0 if empty).

    lw   s0, 0x80(zero)      # input pointer
    addi s0, s0, 4           # skip byte length
    lw   s1, 0(s0)           # n_ops
    addi s2, s0, 4           # -> op[0]
    addi a7, zero, 0x403     # heap pointer -> a0 (the value stack)
    ecall
    mv   s3, a0              # stack base
    addi s4, zero, 0         # stack depth
    addi s5, zero, 0         # pc (op index)

step:
    bgeu s5, s1, done        # pc out of range -> halt
    slli t0, s5, 2
    add  t0, s2, t0
    lw   t1, 0(t0)           # op word
    andi t2, t1, 0xff        # opcode
    srli t3, t1, 8           # imm
    addi s5, s5, 1

    # dispatch
    addi t4, zero, 1
    beq  t2, zero, op_push
    beq  t2, t4, op_add
    addi t4, zero, 2
    beq  t2, t4, op_sub
    addi t4, zero, 3
    beq  t2, t4, op_mul
    addi t4, zero, 4
    beq  t2, t4, op_dup
    addi t4, zero, 5
    beq  t2, t4, op_swap
    addi t4, zero, 6
    beq  t2, t4, op_jnz
    jal  zero, done          # HALT / unknown

op_push:
    slli t0, s4, 2
    add  t0, s3, t0
    sw   t3, 0(t0)
    addi s4, s4, 1
    jal  zero, step

op_add:
    addi s4, s4, -1
    slli t0, s4, 2
    add  t0, s3, t0
    lw   t5, 0(t0)           # b
    addi t0, t0, -4
    lw   t6, 0(t0)           # a
    add  t6, t6, t5
    sw   t6, 0(t0)
    jal  zero, step

op_sub:
    addi s4, s4, -1
    slli t0, s4, 2
    add  t0, s3, t0
    lw   t5, 0(t0)
    addi t0, t0, -4
    lw   t6, 0(t0)
    sub  t6, t6, t5
    sw   t6, 0(t0)
    jal  zero, step

op_mul:
    addi s4, s4, -1
    slli t0, s4, 2
    add  t0, s3, t0
    lw   t5, 0(t0)
    addi t0, t0, -4
    lw   t6, 0(t0)
    mul  t6, t6, t5
    sw   t6, 0(t0)
    jal  zero, step

op_dup:
    slli t0, s4, 2
    add  t0, s3, t0
    addi t1, t0, -4
    lw   t5, 0(t1)
    sw   t5, 0(t0)
    addi s4, s4, 1
    jal  zero, step

op_swap:
    slli t0, s4, 2
    add  t0, s3, t0
    addi t0, t0, -4
    addi t1, t0, -4
    lw   t5, 0(t0)
    lw   t6, 0(t1)
    sw   t6, 0(t0)
    sw   t5, 0(t1)
    jal  zero, step

op_jnz:
    addi s4, s4, -1
    slli t0, s4, 2
    add  t0, s3, t0
    lw   t5, 0(t0)
    beq  t5, zero, step
    mv   s5, t3
    jal  zero, step

done:
    lw   t0, 0x84(zero)      # output pointer
    sw   s4, 0(t0)
    addi t5, zero, 0
    beq  s4, zero, emit
    addi t1, s4, -1
    slli t1, t1, 2
    add  t1, s3, t1
    lw   t5, 0(t1)
emit:
    sw   t5, 4(t0)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
