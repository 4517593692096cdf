"""Differential EVM interpreter tests: hand-assembled bytecode + literal
known-answer vectors (VERDICT round-1 item: the bytecode path must be
checked against something other than this repo's own emitter, so an
emitter bug mirrored in the interpreter cannot pass).

Nothing here uses evm/bytecode.py or utils/refcrypto.py: programs are raw
opcode bytes written out by hand; expected outputs are Python-int
arithmetic, published keccak-256 digests, and an INLINE independent BN254
affine implementation for the precompile vectors.  With the interpreter
pinned to Yellow-Paper semantics by these tests, the e2e verifier tests
(tests/test_evm_verifier.py) then validate the emitter against it.
"""
import pytest

from halo2_zkcert_tpu.evm.interp import Evm

# opcodes used (Yellow Paper appendix H)
STOP, ADD, MUL, SUB, DIV = 0x00, 0x01, 0x02, 0x03, 0x04
ADDMOD, MULMOD = 0x08, 0x09
LT, GT, EQ, ISZERO = 0x10, 0x11, 0x14, 0x15
SHL, SHR = 0x1B, 0x1C
KECCAK256 = 0x20
CALLDATALOAD, CALLDATASIZE = 0x35, 0x36
CODECOPY = 0x39
POP, MLOAD, MSTORE = 0x50, 0x51, 0x52
JUMP, JUMPI, JUMPDEST = 0x56, 0x57, 0x5B
PUSH0, PUSH1, PUSH32 = 0x5F, 0x60, 0x7F
DUP1, SWAP1 = 0x80, 0x90
RETURN, STATICCALL, REVERT = 0xF3, 0xFA, 0xFD


def push(v: int) -> bytes:
    if v == 0:
        return bytes([PUSH0])
    b = v.to_bytes((v.bit_length() + 7) // 8, "big")
    return bytes([PUSH0 + len(b)]) + b


def ret_top() -> bytes:
    """MSTORE the top of stack at 0 and return 32 bytes."""
    return push(0) + bytes([MSTORE]) + push(32) + push(0) + bytes([RETURN])


def run(code: bytes, calldata: bytes = b"") -> bytes:
    evm = Evm()
    evm.runtime = bytes(code)
    res = evm.call(calldata)
    assert res.success, "program reverted"
    return res.output


def word(out: bytes) -> int:
    return int.from_bytes(out, "big")


U256 = 1 << 256


def test_arithmetic_stack_ops():
    # ((7 + 5) * 6 - 2) / 2 = 35   (stack order: SUB pops a, b -> a - b)
    code = (push(2) + push(2) + push(6) + push(5) + push(7)
            + bytes([ADD, MUL, SUB, DIV]))  # ((7+5)*6 - 2) / 2
    assert word(run(code + ret_top())) == ((7 + 5) * 6 - 2) // 2

    # wrap-around: (2^256 - 1) + 2 == 1 mod 2^256
    code = push(2) + push(U256 - 1) + bytes([ADD])
    assert word(run(code + ret_top())) == 1

    # SUB underflow: 3 - 5 == 2^256 - 2
    code = push(5) + push(3) + bytes([SUB])
    assert word(run(code + ret_top())) == (3 - 5) % U256

    # DIV by zero yields 0 (Yellow Paper)
    code = push(0) + push(7) + bytes([DIV])
    assert word(run(code + ret_top())) == 0


def test_addmod_mulmod():
    p = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
    a = p - 3
    b = p - 5
    code = push(p) + push(b) + push(a) + bytes([ADDMOD])
    assert word(run(code + ret_top())) == (a + b) % p
    code = push(p) + push(b) + push(a) + bytes([MULMOD])
    assert word(run(code + ret_top())) == (a * b) % p
    # MULMOD with modulus 0 yields 0
    code = push(0) + push(b) + push(a) + bytes([MULMOD])
    assert word(run(code + ret_top())) == 0


def test_comparisons_shifts():
    for (op, a, b, want) in ((LT, 3, 5, 1), (LT, 5, 3, 0), (GT, 5, 3, 1),
                             (EQ, 9, 9, 1), (EQ, 9, 8, 0)):
        code = push(b) + push(a) + bytes([op])   # a OP b
        assert word(run(code + ret_top())) == want, (op, a, b)
    # ISZERO
    assert word(run(push(0) + bytes([ISZERO]) + ret_top())) == 1
    assert word(run(push(7) + bytes([ISZERO]) + ret_top())) == 0
    # SHL/SHR take (shift, value)
    code = push(5) + push(4) + bytes([SHL])      # 5 << 4
    assert word(run(code + ret_top())) == 80
    code = push(80) + push(4) + bytes([SHR])
    assert word(run(code + ret_top())) == 5


def test_memory_calldata():
    # echo calldata word 1 (offset 32)
    code = push(32) + bytes([CALLDATALOAD]) + ret_top()
    data = (11).to_bytes(32, "big") + (22).to_bytes(32, "big")
    assert word(run(code, data)) == 22
    # CALLDATASIZE
    code = bytes([CALLDATASIZE]) + ret_top()
    assert word(run(code, data)) == 64
    # MSTORE/MLOAD round trip at a high offset (forces memory expansion)
    code = (push(0xDEADBEEF) + push(0x200) + bytes([MSTORE])
            + push(0x200) + bytes([MLOAD]) + ret_top())
    assert word(run(code)) == 0xDEADBEEF
    # calldataload beyond the end is zero-padded
    code = push(4096) + bytes([CALLDATALOAD]) + ret_top()
    assert word(run(code, data)) == 0


def test_keccak_known_answers():
    # published keccak-256 digests (NOT sha3-256)
    code = push(0) + push(0) + bytes([KECCAK256]) + ret_top()
    assert word(run(code)) == int(
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
        16)
    code = (push(0x616263) + push(0) + bytes([MSTORE])       # "abc" at 29..31
            + push(3) + push(29) + bytes([KECCAK256]) + ret_top())
    assert word(run(code)) == int(
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
        16)


def test_jumps_and_revert():
    # fixed layout: 0:PUSH1 1  2:PUSH1 8  4:JUMPI  5,6:PUSH0 7:REVERT
    #               8:JUMPDEST 9... return 7
    tail = bytes([JUMPDEST]) + push(7) + ret_top()
    code = (bytes([PUSH1, 1, PUSH1, 8, JUMPI, PUSH0, PUSH0, REVERT]) + tail)
    assert word(run(code)) == 7
    # JUMPI not taken falls through to revert
    code2 = (bytes([PUSH1, 0, PUSH1, 8, JUMPI, PUSH0, PUSH0, REVERT]) + tail)
    evm = Evm()
    evm.runtime = bytes(code2)
    assert not evm.call(b"").success
    # jump to a non-JUMPDEST must fail
    evm.runtime = bytes(push(1) + bytes([JUMP, STOP]))
    assert not evm.call(b"").success


# ---------------------------------------------------------------------------
# BN254 precompiles vs an INLINE independent affine implementation
# ---------------------------------------------------------------------------

_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _inv(a):
    return pow(a, _Q - 2, _Q)


def _aff_add(p, r):
    """Affine BN254 add (independent of ops/ and utils/refcrypto)."""
    if p is None:
        return r
    if r is None:
        return p
    (x1, y1), (x2, y2) = p, r
    if x1 == x2 and (y1 + y2) % _Q == 0:
        return None
    if p == r:
        lam = 3 * x1 * x1 * _inv(2 * y1) % _Q
    else:
        lam = (y2 - y1) * _inv((x2 - x1) % _Q) % _Q
    x3 = (lam * lam - x1 - x2) % _Q
    return (x3, (lam * (x1 - x3) - y1) % _Q)


def _aff_mul(p, k):
    acc = None
    while k:
        if k & 1:
            acc = _aff_add(acc, p)
        p = _aff_add(p, p)
        k >>= 1
    return acc


def _static(addr: int, data: bytes, outsize: int) -> bytes:
    """Program: memcpy `data` into memory, STATICCALL addr, return output."""
    code = b""
    for i in range(0, len(data), 32):
        w = int.from_bytes(data[i:i + 32].ljust(32, b"\0"), "big")
        code += push(w) + push(i) + bytes([MSTORE])
    code += (push(outsize) + push(0)                  # retOffset=0 retSize
             + push(len(data)) + push(0)              # argsOffset argsSize
             + push(addr) + push(10**9)               # address gas
             + bytes([STATICCALL, POP])
             + push(outsize) + push(0) + bytes([RETURN]))
    return code


G1 = (1, 2)


def test_precompile_ecadd_ecmul():
    two_g = _aff_mul(G1, 2)
    data = (G1[0].to_bytes(32, "big") + G1[1].to_bytes(32, "big")) * 2
    out = run(_static(0x06, data, 64))
    assert (word(out[:32]), word(out[32:])) == two_g

    k = 0xDECAFBAD
    kg = _aff_mul(G1, k)
    data = (G1[0].to_bytes(32, "big") + G1[1].to_bytes(32, "big")
            + k.to_bytes(32, "big"))
    out = run(_static(0x07, data, 64))
    assert (word(out[:32]), word(out[32:])) == kg


def test_precompile_modexp():
    # 0x05: 3^7 mod 10 = 7 (lengths header + operands)
    data = ((1).to_bytes(32, "big") + (1).to_bytes(32, "big")
            + (1).to_bytes(32, "big") + bytes([3, 7, 10]))
    out = run(_static(0x05, data, 1))
    assert out == bytes([pow(3, 7, 10)])


def test_precompile_pairing():
    # e(G1, G2) * e(-G1, G2) == 1  ->  returns 1
    g2 = (  # canonical BN254 G2 generator (x.c1, x.c0, y.c1, y.c0 order
            # per EIP-197 input encoding: imaginary part first)
        0x198E9393920D483A7260BFB731FB5D25F1AA493335A9E71297E485B7AEF312C2,
        0x1800DEEF121F1E76426A00665E5C4479674322D4F75EDADD46DEBD5CD992F6ED,
        0x090689D0585FF075EC9E99AD690C3395BC4B313370B38EF355ACDADCD122975B,
        0x12C85EA5DB8C6DEB4AAB71808DCB408FE3D1E7690C43D37B4CE6CC0166FA7DAA,
    )
    neg_g1 = (G1[0], _Q - G1[1])

    def enc(p1, q2):
        return (p1[0].to_bytes(32, "big") + p1[1].to_bytes(32, "big")
                + q2[0].to_bytes(32, "big") + q2[1].to_bytes(32, "big")
                + q2[2].to_bytes(32, "big") + q2[3].to_bytes(32, "big"))

    good = enc(G1, g2) + enc(neg_g1, g2)
    assert word(run(_static(0x08, good, 32))) == 1
    # e(G1, G2) * e(G1, G2) != 1
    bad = enc(G1, g2) + enc(G1, g2)
    assert word(run(_static(0x08, bad, 32))) == 0


def test_deploy_constructor_codecopy():
    runtime = push(42) + ret_top()
    # constructor (10 bytes): CODECOPY(dest=0, ofs=10, len) ; RETURN(0, len)
    n = len(runtime)
    ctor = bytes([PUSH1, n, PUSH1, 10, PUSH0, CODECOPY,
                  PUSH1, n, PUSH0, RETURN])
    assert len(ctor) == 10
    evm = Evm()
    res = evm.deploy(ctor + runtime)
    assert res.success and evm.runtime == runtime
    assert word(evm.call(b"").output) == 42
