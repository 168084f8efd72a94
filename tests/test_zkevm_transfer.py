"""In-machine trie read/insert (kernel/asm/mpt_ops.asm) against the
host twins, and the transfer block (kernel/asm/txn.asm) end-to-end in
the interpreter (reference evm/src/cpu/kernel/tests/mpt/insert.rs +
evm/tests/simple_transfer.rs, interpreter level)."""

import pytest

from plonky2_tpu.zkevm import mpt, rlp
from plonky2_tpu.zkevm.generation import Simulator
from plonky2_tpu.zkevm.kernel.aggregator import build_kernel
from plonky2_tpu.zkevm.transfer import (BlockMetadata, GenerationInputs,
                                        Transfer, apply_transfer,
                                        public_values, simulate_transfer)

# ------------------------------------------------------- mpt_read/insert

MAIN_INSERT = """
global main:
    PUSH 1
    %mstore_global(@GLOBAL_TRIE_ALLOC)
    PUSH t_loaded
    PUSH parse_storage_value
    %stack (p, r) -> (p, r)
    %jump(mpt_load_node)
t_loaded:
    // stack: root
    PROVER_INPUT                 // n_ops
t_loop:
    // stack: n, root
    DUP1
    ISZERO
    %jumpi(t_done)
    PROVER_INPUT                 // count
    PROVER_INPUT                 // packed
    PROVER_INPUT                 // value
    PUSH 1
    %trie_alloc                  // [vptr, value, packed, count, n, root]
    %stack (vptr, value) -> (vptr, value, vptr)
    %trie_write                  // [vptr, packed, count, n, root]
    %stack (vptr, packed, count, n, root) -> (root, count, packed, vptr, t_ins, n)
    %jump(mpt_insert)
t_ins:
    // stack: newroot, n
    SWAP1
    PUSH 1
    SWAP1
    SUB                          // [n-1, newroot]
    %jump(t_loop)
t_done:
    POP
    %stack (root) -> (root, encode_storage_value, t_hashed)
    %jump(mpt_hash)
t_hashed:
    HALT
"""

MAIN_READ = """
global main:
    PUSH 1
    %mstore_global(@GLOBAL_TRIE_ALLOC)
    PUSH r_loaded
    PUSH parse_storage_value
    %stack (p, r) -> (p, r)
    %jump(mpt_load_node)
r_loaded:
    // stack: root
    PROVER_INPUT                 // n
    PUSH 0                       // i
r_loop:
    // stack: i, n, root
    DUP2
    DUP2
    EQ
    %jumpi(r_done)
    PROVER_INPUT                 // count
    PROVER_INPUT                 // packed
    DUP5                         // [root, packed, count, i, n, root]
    %stack (root, packed, count) -> (root, count, packed, r_read)
    %jump(mpt_read)
r_read:
    // stack: vptr, i, n, root
    DUP1
    ISZERO
    %jumpi(r_store)
    %trie_read                   // storage word at the hit
    PUSH 1
    ADD                          // encode presence as value+1
r_store:
    // stack: res, i, n, root
    DUP2
    PUSH @SEGMENT_MAIN
    MSTORE_GENERAL               // MAIN[i] = res
    PUSH 1
    ADD
    %jump(r_loop)
r_done:
    HALT
"""


def _storage_trie(kv: dict):
    t = mpt.Empty()
    for k, v in kv.items():
        t = mpt.trie_insert(t, k, rlp.encode(v))
    return t


def _key(b: bytes) -> tuple:
    return mpt.bytes_to_nibbles(b)


def _run(main, inputs, max_cycles=4_000_000):
    kernel = build_kernel(main_source=main)
    sim = Simulator(kernel=kernel, prover_inputs=inputs, trace=False,
                    max_cycles=max_cycles)
    sim.run()
    return sim


def test_kernel_mpt_read_matches_host():
    kv = {_key(b"\x12\x34"): 111, _key(b"\x12\x35"): 222,
          _key(b"\x12"): 333, _key(b"\x99\x00\x01"): 2 ** 200,
          (): 444}
    t = _storage_trie(kv)
    queries = list(kv) + [_key(b"\x12\x36"), _key(b"\x45"),
                          _key(b"\x12\x34\x01"), (9,)]
    pi = mpt.prover_inputs(t, mpt._parse_storage_value)
    pi.append(len(queries))
    for q in queries:
        pi += [len(q), mpt.pack_nibbles(q)]
    sim = _run(MAIN_READ, pi)
    from plonky2_tpu.zkevm.cpu import SEG_MAIN
    for i, q in enumerate(queries):
        want = mpt.trie_get(t, q)
        want = rlp.decode_int(rlp.decode(want)) + 1 if want is not None else 0
        assert sim.memory.get((0, SEG_MAIN, i), 0) == want, (i, q)


@pytest.mark.parametrize("case", ["fresh", "split", "deep"])
def test_kernel_mpt_insert_matches_host(case):
    if case == "fresh":
        base, ins = {}, [(_key(b"\xab\xcd"), 5)]
    elif case == "split":
        base = {_key(b"\x12\x34\x56"): 1}
        ins = [(_key(b"\x12\x34\x99"), 7), (_key(b"\x12"), 8),
               (_key(b"\x12\x34\x56"), 9)]
    else:
        base = {_key(bytes([i, i * 3 % 256])): i + 1 for i in range(12)}
        ins = [(_key(bytes([i, i * 5 % 256, 7])), i + 100)
               for i in range(8)]
    t = _storage_trie(base)
    pi = mpt.prover_inputs(t, mpt._parse_storage_value)
    pi.append(len(ins))
    for k, v in ins:
        pi += [len(k), mpt.pack_nibbles(k), v]
    expect = t
    for k, v in ins:
        expect = mpt.trie_insert(expect, k, rlp.encode(v))
    sim = _run(MAIN_INSERT, pi)
    got = sim.final_stack[-1]
    assert got == int.from_bytes(mpt.trie_hash(expect), "little")


# ------------------------------------------------------- transfer block

A = bytes.fromhex("a94f5374fce5edbc8e2a8697c15331677e6ebf0b")
B = bytes.fromhex("095e7baea6a6c7c4c2dfeb977efac326af552d87")
COINBASE = bytes.fromhex("2adc25665018aa1fe0e6bc666dac8fc2697ff9ba")


def _base_inputs(to=B, value=4 * 10 ** 15, nonce=5, gas_price=10,
                 extra_accounts=()):
    state = mpt.Empty()
    sender = mpt.Account(nonce=nonce, balance=10 ** 18)
    state = mpt.trie_insert(state, mpt.state_key(A), sender.encode())
    for addr, acct in extra_accounts:
        state = mpt.trie_insert(state, mpt.state_key(addr), acct.encode())
    return GenerationInputs(
        txn=Transfer(sender=A, to=to, value=value, nonce=nonce,
                     gas_price=gas_price),
        tries=mpt.TrieInputs(state_trie=state),
        block_metadata=BlockMetadata(beneficiary=COINBASE, number=1,
                                     timestamp=1_000_000))


def test_transfer_fresh_recipient():
    """simple_transfer.rs:29 shape: to-account does not exist yet."""
    inputs = _base_inputs()
    sim, pv = simulate_transfer(inputs, trace=False)
    # the kernel checked all six roots in-machine; cross-check the host
    after = apply_transfer(inputs)
    assert pv.trie_roots_after.state == mpt.trie_hash(after.state_trie)
    to = mpt.Account.decode(
        mpt.trie_get(after.state_trie, mpt.state_key(B)))
    assert to.balance == 4 * 10 ** 15 and to.nonce == 0
    cb = mpt.Account.decode(
        mpt.trie_get(after.state_trie, mpt.state_key(COINBASE)))
    assert cb.balance == 10 * 21000


def test_transfer_existing_recipient_and_zero_fee():
    inputs = _base_inputs(gas_price=0, extra_accounts=[
        (B, mpt.Account(nonce=3, balance=77))])
    sim, pv = simulate_transfer(inputs, trace=False)
    after = apply_transfer(inputs)
    to = mpt.Account.decode(
        mpt.trie_get(after.state_trie, mpt.state_key(B)))
    assert to.balance == 77 + 4 * 10 ** 15 and to.nonce == 3


def test_transfer_wrong_after_root_panics():
    """A forged after-state-root sends the kernel into the panic spin —
    no HALT row, no proof."""
    from plonky2_tpu.zkevm.kernel.aggregator import GLOBAL_STATE_ROOT_AFTER
    from plonky2_tpu.zkevm.transfer import (global_values_for,
                                            txn_kernel)
    inputs = _base_inputs()
    pv = public_values(inputs)
    gv = global_values_for(pv)
    gv[GLOBAL_STATE_ROOT_AFTER] ^= 1
    sim = Simulator(kernel=txn_kernel(), global_values=gv,
                    prover_inputs=mpt.state_prover_inputs(inputs.tries),
                    trace=False, max_cycles=400_000)
    with pytest.raises(RuntimeError):
        sim.run()


def test_transfer_bad_nonce_rejected():
    inputs = _base_inputs()
    object.__setattr__(inputs.txn, "nonce", 6)  # sender nonce is 5
    with pytest.raises(AssertionError):
        apply_transfer(inputs)


def test_transfer_insufficient_balance_rejected():
    inputs = _base_inputs(value=2 * 10 ** 18)
    with pytest.raises(AssertionError):
        apply_transfer(inputs)


def test_empty_block():
    """evm/tests/empty_txn_list.rs equivalent: txn=None proves an empty
    block — nothing executes, after-roots equal before-roots, and the
    kernel still loads, hashes, and checks all six roots in-machine."""
    base = _base_inputs()
    inputs = GenerationInputs(txn=None, tries=base.tries,
                              block_metadata=base.block_metadata)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert pv.trie_roots_after == pv.trie_roots_before
    assert pv.txn is None

    # a forged after-root on an empty block is unprovable
    from plonky2_tpu.zkevm.kernel.aggregator import GLOBAL_TXN_ROOT_AFTER
    from plonky2_tpu.zkevm.transfer import global_values_for, txn_kernel
    gv = global_values_for(pv)
    gv[GLOBAL_TXN_ROOT_AFTER] ^= 1
    sim = Simulator(kernel=txn_kernel(), global_values=gv,
                    prover_inputs=mpt.state_prover_inputs(inputs.tries),
                    trace=False, max_cycles=400_000)
    with pytest.raises(RuntimeError):
        sim.run()


# -------------------------------------------------- signed transactions

PRIV = 0x4646464646464646464646464646464646464646464646464646464646464646


def _signed_inputs(value=4 * 10 ** 15, forge=False):
    from plonky2_tpu.zkevm.transfer import sign_transfer
    txn = sign_transfer(Transfer(sender=b"\x00" * 20, to=B, value=value,
                                 nonce=5, gas_price=10), PRIV)
    if forge:
        import dataclasses
        v, r, s = txn.sig
        txn = dataclasses.replace(
            txn, sig=(v, r, (s + 1) % (2 ** 256)))
    state = mpt.Empty()
    state = mpt.trie_insert(state, mpt.state_key(txn.sender),
                            mpt.Account(nonce=5, balance=10 ** 18).encode())
    return GenerationInputs(
        txn=txn, tries=mpt.TrieInputs(state_trie=state),
        block_metadata=BlockMetadata(beneficiary=COINBASE, number=1))


def test_signed_transfer_in_kernel_ecrecover():
    """The kernel recovers the sender from the legacy signature over
    keccak(unsigned txn RLP) (curve.asm verify_txn_signature) and the
    EIP-155-example key's address matches the claimed sender."""
    inputs = _signed_inputs()
    assert inputs.txn.sender.hex() == \
        "9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f"  # known 0x46..46 addr
    sim, pv = simulate_transfer(inputs, trace=False, max_cycles=2_000_000)
    after = apply_transfer(inputs)
    assert pv.trie_roots_after.state == mpt.trie_hash(after.state_trie)


def test_forged_signature_unprovable():
    """A signature by a different key recovers a different address: the
    kernel PANICs (no HALT row -> no proof), and the host twin raises."""
    from plonky2_tpu.field import secp256k1 as secp
    from plonky2_tpu.zkevm.transfer import (_sig_inputs, global_values_for,
                                            txn_kernel)
    inputs = _signed_inputs()
    import dataclasses
    v, r, s = inputs.txn.sig
    other_k = 0xabcdef0123456789
    v2, r2, s2 = secp.ecdsa_sign(inputs.txn.sighash(), PRIV + 2, other_k)
    inputs.txn = dataclasses.replace(inputs.txn, sig=(v2, r2, s2))
    with pytest.raises(AssertionError):
        apply_transfer(inputs)
    # kernel level: claimed sender unchanged, forged sig -> panic spin
    from plonky2_tpu.zkevm.transfer import PublicValues, TrieRoots
    roots = TrieRoots(mpt.trie_hash(inputs.tries.state_trie),
                      mpt.trie_hash(inputs.tries.transactions_trie),
                      mpt.trie_hash(inputs.tries.receipts_trie))
    gv = global_values_for(PublicValues(roots, roots,
                                        inputs.block_metadata, inputs.txn))
    sim = Simulator(kernel=txn_kernel(), global_values=gv,
                    prover_inputs=(mpt.state_prover_inputs(inputs.tries)
                                   + _sig_inputs(inputs)),
                    trace=False, max_cycles=1_500_000)
    with pytest.raises(RuntimeError):
        sim.run()


def test_invalid_signature_hints_rejected_on_host():
    from plonky2_tpu.field import secp256k1 as secp
    with pytest.raises(AssertionError):
        secp.ecrecover_kernel_hints(123, 29, 5, 5)      # bad v
    with pytest.raises(AssertionError):
        secp.ecrecover_kernel_hints(123, 27, 0, 5)      # r = 0


def test_kernel_ladder_twin_matches_affine_recover():
    from plonky2_tpu.field import secp256k1 as secp
    h = 0x1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8
    for k in (12345, 2 ** 200 + 7):
        v, r, s = secp.ecdsa_sign(h, PRIV, k)
        a1 = secp.pubkey_to_address(secp.ecdsa_recover(h, v, r, s))
        assert secp.ecrecover_kernel_twin(h, v, r, s) == a1
