"""Contract execution in a sub-context: calldata, storage, RETURN /
REVERT / fault semantics with journal rollback, and the deploy-and-call
proof (reference evm/tests/basic_smart_contract.rs + journal/revert.asm
semantics; kernel side in kernel/asm/contract.asm)."""

import numpy as np
import pytest

from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.zkevm import mpt, rlp
from plonky2_tpu.zkevm.cpu import SEG_GLOBAL
from plonky2_tpu.zkevm.kernel import assemble
from plonky2_tpu.zkevm.kernel.aggregator import (GLOBAL_GAS_USED,
                                                 GLOBAL_RETURNDATA_LEN,
                                                 GLOBAL_TXN_FAILED)
from plonky2_tpu.zkevm.transfer import (BlockMetadata, GenerationInputs,
                                        TXN_GAS, Transfer, code_hash,
                                        simulate_transfer)

SENDER = bytes([0xAA]) * 20
CONTRACT = bytes([0xBB]) * 20
BENEFICIARY = bytes([0xCC]) * 20
GAS_PRICE = 2


def contract_asm(src: str) -> list:
    """Contract code assembles against load address 0: it runs at
    (child_ctx, SEG_CODE, pc) from pc 0."""
    return assemble([src], base=0)[0]


def storage_with(slots: dict):
    t = mpt.Empty()
    for slot, val in slots.items():
        key = mpt.bytes_to_nibbles(keccak256(slot.to_bytes(32, "big")))
        t = mpt.trie_insert(t, key, rlp.encode(val))
    return t


def make_inputs(code: list, txn_value=5, data=b"", slots={7: 42},
                contract_balance=1000):
    chash = code_hash(code)
    storage = storage_with(slots)
    state = mpt.Empty()
    state = mpt.trie_insert(state, mpt.state_key(SENDER),
                            mpt.Account(nonce=3, balance=10 ** 18).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=1, balance=contract_balance,
                    storage_root=mpt.trie_hash(storage),
                    code_hash=chash).encode())
    txn = Transfer(sender=SENDER, to=CONTRACT, value=txn_value, nonce=3,
                   gas_price=GAS_PRICE, data=data)
    tries = mpt.TrieInputs(
        state_trie=state,
        storage_tries=[(mpt.state_key(CONTRACT), storage)])
    return GenerationInputs(
        txn, tries, BlockMetadata(beneficiary=BENEFICIARY),
        contract_code={chash: code})


def expected_after_state(inputs, contract_slots, txn_reverted):
    """Host-built post-state trie (the independent cross-check of the
    kernel's dry-run-published root)."""
    txn = inputs.txn
    fee = txn.gas_price * txn.intrinsic_gas()
    value = 0 if txn_reverted else txn.value
    storage = storage_with(contract_slots)
    state = mpt.Empty()
    state = mpt.trie_insert(
        state, mpt.state_key(SENDER),
        mpt.Account(nonce=4, balance=10 ** 18 - fee - value).encode())
    chash = next(iter(inputs.contract_code))
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=1, balance=1000 + value,
                    storage_root=mpt.trie_hash(storage),
                    code_hash=chash).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(BENEFICIARY),
        mpt.Account(balance=fee).encode())
    return mpt.trie_hash(state)


def expected_txn_receipt_roots(txn, status, gas_used, logs=()):
    key0 = mpt.bytes_to_nibbles(rlp.encode(0))
    txn_root = mpt.trie_hash(mpt.trie_insert(mpt.Empty(), key0, txn.rlp()))
    receipt = txn.receipt_rlp(status, txn.intrinsic_gas() + gas_used, logs)
    receipt_root = mpt.trie_hash(mpt.trie_insert(mpt.Empty(), key0, receipt))
    return txn_root, receipt_root


def test_contract_sstore_calldata_and_stop():
    """The contract stores CALLDATALOAD(0) + CALLVALUE into slot 7 and
    STOPs; the kernel-computed after-roots must equal the host-built
    expected tries."""
    code = contract_asm("""
global ctr_main:
    PUSH 0
    CALLDATALOAD      // [x]
    CALLVALUE
    ADD               // [x + value]
    PUSH 7
    SSTORE            // storage[7] = x + value
    STOP
""")
    x = 0xDEAD_BEEF_0000_0001
    inputs = make_inputs(code, txn_value=5, data=x.to_bytes(32, "big"))
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    gas = sim.memory.get((0, SEG_GLOBAL, GLOBAL_GAS_USED), 0)
    assert gas > 0

    want_state = expected_after_state(inputs, {7: x + 5},
                                      txn_reverted=False)
    assert pv.trie_roots_after.state == want_state
    want_txn, want_rcpt = expected_txn_receipt_roots(inputs.txn, 1, gas)
    assert pv.trie_roots_after.transactions == want_txn
    assert pv.trie_roots_after.receipts == want_rcpt


def test_contract_return_with_returndata():
    """RETURN copies (ctx, SEG_BYTES) into the parent's returndata."""
    code = contract_asm("""
global ctr_main:
    PUSH 0x61
    PUSH 0
    MSTORE8
    PUSH 0x62
    PUSH 1
    MSTORE8
    PUSH 2            // len
    PUSH 0            // offset (top)
    RETURN
""")
    inputs = make_inputs(code, data=b"")
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_RETURNDATA_LEN), 0) == 2
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    assert sim.memory.get((0, SEG_RETURNDATA, 0), 0) == 0x61
    assert sim.memory.get((0, SEG_RETURNDATA, 1), 0) == 0x62


def test_contract_revert_rolls_back():
    """REVERT undoes the SSTOREs AND the value transfer, but the fee and
    the nonce bump persist and the receipt status is 0
    (journal/revert.asm semantics)."""
    code = contract_asm("""
global ctr_main:
    PUSH 99
    PUSH 7
    SSTORE            // storage[7] = 99 (will be rolled back to 42)
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_inputs(code)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 1
    gas = sim.memory.get((0, SEG_GLOBAL, GLOBAL_GAS_USED), 0)

    want_state = expected_after_state(inputs, {7: 42}, txn_reverted=True)
    assert pv.trie_roots_after.state == want_state
    want_txn, want_rcpt = expected_txn_receipt_roots(inputs.txn, 0, gas)
    assert pv.trie_roots_after.transactions == want_txn
    assert pv.trie_roots_after.receipts == want_rcpt


def test_contract_fault_fails_txn():
    """A user fault in the contract frame (invalid opcode) fails the
    transaction like REVERT — the block still proves (fault_exception's
    contract path), it does NOT halt with exc_status."""
    code = contract_asm("""
global ctr_main:
    PUSH 77
    PUSH 7
    SSTORE
    INVALID
""")
    inputs = make_inputs(code)
    sim, pv = simulate_transfer(inputs)
    assert sim.exc_status == 0          # the BLOCK is fine
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 1
    want_state = expected_after_state(inputs, {7: 42}, txn_reverted=True)
    assert pv.trie_roots_after.state == want_state


def test_contract_sload_and_caller():
    """SLOAD reads the pre-seeded slot; CALLER/ADDRESS/CALLDATASIZE
    return the txn environment; results land in storage for checking."""
    code = contract_asm("""
global ctr_main:
    PUSH 7
    SLOAD             // [42]
    PUSH 1
    SSTORE            // storage[1] = 42
    CALLER
    PUSH 2
    SSTORE            // storage[2] = sender
    ADDRESS
    PUSH 3
    SSTORE            // storage[3] = contract address
    CALLDATASIZE
    PUSH 4
    SSTORE            // storage[4] = 3
    STOP
""")
    inputs = make_inputs(code, data=b"abc")
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want_state = expected_after_state(
        inputs,
        {7: 42, 1: 42, 2: int.from_bytes(SENDER, "big"),
         3: int.from_bytes(CONTRACT, "big"), 4: 3},
        txn_reverted=False)
    assert pv.trie_roots_after.state == want_state


def test_wrong_code_panics():
    """Code whose keccak does not match the account's code_hash must be
    unprovable (load_contract_code panics -> the sim never halts)."""
    code = contract_asm("global ctr_main:\n STOP\n")
    inputs = make_inputs(code)
    forged = contract_asm("global ctr_main:\n PUSH 1\n PUSH 7\n"
                          " SSTORE\n STOP\n")
    inputs.contract_code = {code_hash(code): forged}
    with pytest.raises((RuntimeError, AssertionError)):
        simulate_transfer(inputs)


def test_contract_revert_fresh_slot_deletes_key():
    """Round-5: SSTORE to a previously-ABSENT slot followed by REVERT
    must restore the exact pre-state root — the journal records
    @J_SABSENT and revert runs mpt_delete (the round-4 value-replay
    gap: writing back 0 would leave an explicit zero leaf and a
    different root)."""
    code = contract_asm("""
global ctr_main:
    PUSH 123
    PUSH 31        // slot 31 is absent in the pre-state (only 7 exists)
    SSTORE
    PUSH 55
    PUSH 32        // second fresh slot
    SSTORE
    PUSH 100
    PUSH 7         // existing slot: plain value-replay path
    SSTORE
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_inputs(code)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 1
    # the reverted state must carry the ORIGINAL storage ({7: 42}) —
    # not explicit zeros in slots 31/32
    want_state = expected_after_state(inputs, {7: 42}, txn_reverted=True)
    assert pv.trie_roots_after.state == want_state


# ------------------------------------------------- inner message calls

B_CONTRACT = bytes.fromhex("1000000000000000000000000000000000000001")


def make_two_contract_inputs(code_a: list, code_b: list, txn_value=5,
                             b_balance=50):
    """A (txn recipient) CALLs B; both carry code."""
    ha, hb = code_hash(code_a), code_hash(code_b)
    storage_a = storage_with({7: 42})
    state = mpt.Empty()
    state = mpt.trie_insert(state, mpt.state_key(SENDER),
                            mpt.Account(nonce=3, balance=10 ** 18).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=1, balance=1000,
                    storage_root=mpt.trie_hash(storage_a),
                    code_hash=ha).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(B_CONTRACT),
        mpt.Account(nonce=1, balance=b_balance, code_hash=hb).encode())
    txn = Transfer(sender=SENDER, to=CONTRACT, value=txn_value, nonce=3,
                   gas_price=GAS_PRICE)
    tries = mpt.TrieInputs(
        state_trie=state,
        storage_tries=[(mpt.state_key(CONTRACT), storage_a),
                       (mpt.state_key(B_CONTRACT), mpt.Empty())])
    return GenerationInputs(
        txn, tries, BlockMetadata(beneficiary=BENEFICIARY),
        contract_code={ha: code_a, hb: code_b},
        inner_code_loads=[hb])


def _two_contract_expected(inputs, a_slots, b_slots, b_balance,
                           a_value_delta):
    txn = inputs.txn
    fee = txn.gas_price * txn.intrinsic_gas()
    state = mpt.Empty()
    state = mpt.trie_insert(
        state, mpt.state_key(SENDER),
        mpt.Account(nonce=4, balance=10 ** 18 - fee - txn.value).encode())
    hb = inputs.inner_code_loads[0]
    ha = [h for h in inputs.contract_code if h != hb][0]
    sa = storage_with(a_slots)
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=1, balance=1000 + txn.value + a_value_delta,
                    storage_root=mpt.trie_hash(sa), code_hash=ha).encode())
    sb = storage_with(b_slots)
    state = mpt.trie_insert(
        state, mpt.state_key(B_CONTRACT),
        mpt.Account(nonce=1, balance=b_balance,
                    storage_root=mpt.trie_hash(sb),
                    code_hash=hb).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(BENEFICIARY),
        mpt.Account(balance=fee).encode())
    return mpt.trie_hash(state)


A_CALLS_B = """
global a_main:
    PUSH 32            // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 7             // value
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000       // gas forwarded (63/64-capped, gas.asm)
    CALL               // -> status
    PUSH 1
    ADD                // status + 1 (avoid storing an explicit 0)
    PUSH 1
    SSTORE             // A.storage[1] = status + 1
    RETURNDATASIZE
    PUSH 1
    ADD
    PUSH 2
    SSTORE             // A.storage[2] = returndatasize + 1
    STOP
"""


def test_inner_call_success_value_and_returndata():
    """A calls B; B stores CALLVALUE, returns 3 bytes; A records the
    status and returndata size.  Value moves A -> B inside the frame
    (core/call.asm semantics, reduced)."""
    code_a = contract_asm(A_CALLS_B)
    code_b = contract_asm("""
global b_main:
    CALLVALUE
    PUSH 5
    SSTORE             // B.storage[5] = callvalue (7)
    PUSH 0x99
    PUSH 0
    MSTORE8
    PUSH 3             // len
    PUSH 0             // offset
    RETURN
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 2, 2: 4},      # status+1=2, rdsize+1=4
        b_slots={5: 7}, b_balance=57, a_value_delta=-7)
    assert pv.trie_roots_after.state == want


def test_inner_call_revert_rolls_back_child_only():
    """A calls B; B SSTOREs (incl. a fresh slot) and REVERTs.  A observes
    status 0, B's state AND the 7-wei transfer are rolled back, but A's
    own writes and the txn itself succeed."""
    code_a = contract_asm(A_CALLS_B)
    code_b = contract_asm("""
global b_main:
    PUSH 123
    PUSH 5
    SSTORE             // fresh slot -> @J_SABSENT entry
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    # the child revert undoes B's storage AND the 7-wei value transfer
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 1, 2: 1},      # status+1=1, rdsize+1=1
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want


def test_inner_call_to_codeless_account_transfers():
    """CALL to an account with no code is a plain transfer: status 1,
    empty returndata."""
    code_a = contract_asm(A_CALLS_B)
    inputs = make_two_contract_inputs(code_a, contract_asm("STOP"))
    # strip B's code: account without code, no inner loads
    state = inputs.tries.state_trie
    state = mpt.trie_insert(
        state, mpt.state_key(B_CONTRACT),
        mpt.Account(nonce=1, balance=50).encode())
    inputs.tries = mpt.TrieInputs(
        state_trie=state, storage_tries=inputs.tries.storage_tries)
    inputs.inner_code_loads = []
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0


# ------------------------------------------------------- precompiles

def test_precompile_identity_and_expmod():
    """CALL to 0x04 (identity) and 0x05 (expmod, one-word operands):
    in-kernel dispatch (precompiles.asm), returndata observable via
    RETURNDATASIZE and the simulator's RETURNDATA segment."""
    code_a = contract_asm("""
global a_main:
    // ---- expmod(3^5 mod 7) = 5: header sizes 1/1/1 + operands
    PUSH 1
    PUSH 31
    MSTORE8
    PUSH 1
    PUSH 63
    MSTORE8
    PUSH 1
    PUSH 95
    MSTORE8
    PUSH 3
    PUSH 96
    MSTORE8
    PUSH 5
    PUSH 97
    MSTORE8
    PUSH 7
    PUSH 98
    MSTORE8
    PUSH 32            // retSize
    PUSH 128           // retOff
    PUSH 99            // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 5             // addr: expmod
    PUSH 0             // gas
    CALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // slot1 = status + 1 (2 on success)
    RETURNDATASIZE
    PUSH 2
    SSTORE             // slot2 = msize (1)
    // ---- identity over the 6 header bytes we wrote
    PUSH 8             // retSize
    PUSH 160           // retOff
    PUSH 99            // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 4             // addr: identity
    PUSH 0             // gas
    CALL
    PUSH 1
    ADD
    PUSH 3
    SSTORE             // slot3 = status + 1
    RETURNDATASIZE
    PUSH 4
    SSTORE             // slot4 = 99
    STOP
""")
    inputs = make_inputs(code_a, txn_value=0)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want_state = expected_after_state(
        inputs, {7: 42, 1: 2, 2: 1, 3: 2, 4: 99}, txn_reverted=False)
    assert pv.trie_roots_after.state == want_state


def test_precompile_ecrecover():
    """CALL to 0x01 runs the curve.asm Jacobian-ladder ecrecover; the
    three inversion hints ride GenerationInputs.extra_prover_inputs."""
    from plonky2_tpu.field import secp256k1 as secp
    priv = 0x1111111111111111111111111111111111111111111111111111111111111111
    h = 0x5aadbeefcafef00d5aadbeefcafef00d5aadbeefcafef00d5aadbeefcafef00d
    v, r, s = secp.ecdsa_sign(h, priv, 424242)
    expected = secp.pubkey_to_address(secp.ecdsa_recover(h, v, r, s))
    data = (h.to_bytes(32, "big") + v.to_bytes(32, "big")
            + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    writes = "".join(f"    PUSH {b}\n    PUSH {i}\n    MSTORE8\n"
                     for i, b in enumerate(data) if b)
    code_a = contract_asm(f"""
global a_main:
{writes}
    PUSH 32            // retSize
    PUSH 128           // retOff
    PUSH 128           // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 1             // addr: ecrecover
    PUSH 0             // gas
    CALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE
    STOP
""")
    inputs = make_inputs(code_a, txn_value=0)
    inputs.extra_prover_inputs = secp.ecrecover_kernel_hints(h, v, r, s)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    got = bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
                for i in range(32))
    assert got[:12] == b"\x00" * 12 and got[12:] == expected
    want_state = expected_after_state(
        inputs, {7: 42, 1: 2}, txn_reverted=False)
    assert pv.trie_roots_after.state == want_state


# ------------------------------------------------------- event logs

def _receipt_root_after(sim):
    from plonky2_tpu.zkevm.kernel.aggregator import GLOBAL_RECEIPT_ROOT_AFTER
    return int(sim.memory[(0, SEG_GLOBAL,
                           GLOBAL_RECEIPT_ROOT_AFTER)]).to_bytes(32, "big")


def test_logs_receipt_bloom_and_payload():
    """LOG1 + LOG2 land in the receipt as rlp([status, gas, bloom,
    logs]) with the EVM bloom bits — pinned against the independent
    host encoder (transfer.receipt_payload / logs_bloom; kernel side
    logs.asm + txn.asm build_receipt_value)."""
    code = contract_asm("""
global ctr_main:
    PUSH 0x68
    PUSH 0
    MSTORE8
    PUSH 0x69
    PUSH 1
    MSTORE8
    PUSH 0x1234        // topic1
    PUSH 2             // size
    PUSH 0             // offset
    LOG1
    PUSH 0xdead        // topic2
    PUSH 0xbeef        // topic1
    PUSH 0
    PUSH 0
    LOG2
    STOP
""")
    inputs = make_inputs(code, txn_value=5)
    sim, pv = simulate_transfer(inputs, trace=False)
    gas = int(sim.memory[(0, SEG_GLOBAL, GLOBAL_GAS_USED)])
    logs = [(CONTRACT, [0x1234], b"hi"), (CONTRACT, [0xBEEF, 0xDEAD], b"")]
    _, want = expected_txn_receipt_roots(inputs.txn, 1, gas, logs)
    assert _receipt_root_after(sim) == want
    assert pv.trie_roots_after.receipts == want


def test_reverted_top_frame_drops_logs():
    """A REVERTing frame truncates its own logs (@J_LOG journal replay):
    the receipt carries status 0, an all-zero bloom, and no logs."""
    code = contract_asm("""
global ctr_main:
    PUSH 0x42
    PUSH 0
    PUSH 0
    LOG1
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 1
    gas = int(sim.memory[(0, SEG_GLOBAL, GLOBAL_GAS_USED)])
    _, want = expected_txn_receipt_roots(inputs.txn, 0, gas, logs=())
    assert _receipt_root_after(sim) == want


def test_inner_call_revert_truncates_child_logs():
    """A logs, calls B (which logs then reverts), then logs again: the
    receipt keeps exactly A's two logs, in order — the child's log span
    is rolled back without touching the parent's."""
    code_a = contract_asm("""
global a_main:
    PUSH 0xA1          // topic
    PUSH 0
    PUSH 0
    LOG1
    PUSH 0             // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 0             // gas
    CALL
    POP
    PUSH 0xC3          // topic
    PUSH 0
    PUSH 0
    LOG1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    PUSH 0xB2
    PUSH 0
    PUSH 0
    LOG1
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    gas = int(sim.memory[(0, SEG_GLOBAL, GLOBAL_GAS_USED)])
    logs = [(CONTRACT, [0xA1], b""), (CONTRACT, [0xC3], b"")]
    _, want = expected_txn_receipt_roots(inputs.txn, 1, gas, logs)
    assert _receipt_root_after(sim) == want


# ------------------------------------------------- contract creation

def _create_expected_state(inputs, a_slots, a_nonce, a_balance,
                           created=None):
    """Post-state for single-contract CREATE tests: sender paid fee +
    value, A at CONTRACT with the given slots/nonce/balance, optionally
    a created account (addr, nonce, balance, code_hash)."""
    txn = inputs.txn
    fee = txn.gas_price * txn.intrinsic_gas()
    sa = storage_with(a_slots)
    chash = next(iter(inputs.contract_code))
    state = mpt.Empty()
    state = mpt.trie_insert(
        state, mpt.state_key(SENDER),
        mpt.Account(nonce=4, balance=10 ** 18 - fee - txn.value).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=a_nonce, balance=a_balance,
                    storage_root=mpt.trie_hash(sa),
                    code_hash=chash).encode())
    if created is not None:
        addr, nonce, balance, code = created
        state = mpt.trie_insert(
            state, mpt.state_key(addr),
            mpt.Account(nonce=nonce, balance=balance,
                        code_hash=code).encode())
    state = mpt.trie_insert(state, mpt.state_key(BENEFICIARY),
                            mpt.Account(balance=fee).encode())
    return mpt.trie_hash(state)


def test_create_deploys_account():
    """CREATE from 33 zero init bytes (= one STOP instruction): a fresh
    account appears at keccak(rlp([creator, nonce]))[12:] with nonce 1
    and the endowment; the creator's nonce bumps; the new address is
    CREATE's result (create.asm)."""
    code = contract_asm("""
global a_main:
    PUSH 33            // size
    PUSH 0             // offset
    PUSH 1             // value
    CREATE
    PUSH 1
    SSTORE             // storage[1] = new address
    STOP
""")
    inputs = make_inputs(code, txn_value=5)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    new_addr = keccak256(rlp.encode([CONTRACT, 1]))[12:]
    want = _create_expected_state(
        inputs, {7: 42, 1: int.from_bytes(new_addr, "big")},
        a_nonce=2, a_balance=1000 + 5 - 1,
        created=(new_addr, 1, 1, mpt.EMPTY_CODE_HASH))
    assert pv.trie_roots_after.state == want


def test_create_deploy_code_then_call():
    """The init code RETURNs 33 zero bytes (a STOP contract): the
    deployed account carries keccak of that code, and a follow-up CALL
    to it (loading the code via the prover stream, verified against the
    deployed hash) succeeds with a value transfer."""
    # init: RETURN(0, 33) — three instructions
    code = contract_asm("""
global a_main:
    // init code at BYTES[0..99): PUSH 33; PUSH 0; RETURN
    PUSH 0x60
    PUSH 0
    MSTORE8
    PUSH 33
    PUSH 32
    MSTORE8            // imm of "PUSH 33" (BE low byte at offset 32)
    PUSH 0x60
    PUSH 33
    MSTORE8
    PUSH 0xf3
    PUSH 66
    MSTORE8            // RETURN opcode
    PUSH 99            // size
    PUSH 0             // offset
    PUSH 0             // value
    CREATE             // -> addr
    DUP1
    PUSH 1
    SSTORE             // storage[1] = addr
    // CALL addr with value 3
    PUSH 0             // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 3             // value
    DUP6               // addr
    PUSH 1000000       // gas
    CALL
    PUSH 2
    SSTORE             // storage[2] = call status (1)
    STOP
""")
    deployed = [(0x00, 0)]  # 33 zero bytes decode to one STOP
    inputs = make_inputs(code, txn_value=5)
    inputs.contract_code[code_hash(deployed)] = deployed
    inputs.inner_code_loads = [code_hash(deployed)]
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    new_addr = keccak256(rlp.encode([CONTRACT, 1]))[12:]
    want = _create_expected_state(
        inputs, {7: 42, 1: int.from_bytes(new_addr, "big"), 2: 1},
        a_nonce=2, a_balance=1000 + 5 - 3,
        created=(new_addr, 1, 3, code_hash(deployed)))
    assert pv.trie_roots_after.state == want


def test_create_init_revert_keeps_nonce_only():
    """A reverting init frame: CREATE pushes 0, the account creation and
    endowment unwind, but the creator's nonce bump persists (EVM)."""
    code = contract_asm("""
global a_main:
    // init code: PUSH 0; PUSH 0; REVERT  (3 instructions, 99 bytes)
    PUSH 0x60
    PUSH 0
    MSTORE8
    PUSH 0x60
    PUSH 33
    MSTORE8
    PUSH 0xfd
    PUSH 66
    MSTORE8            // REVERT opcode
    PUSH 99
    PUSH 0
    PUSH 1             // value (must be refunded by the revert)
    CREATE
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // storage[1] = result + 1 = 1
    STOP
""")
    inputs = make_inputs(code, txn_value=5)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _create_expected_state(
        inputs, {7: 42, 1: 1}, a_nonce=2, a_balance=1000 + 5)
    assert pv.trie_roots_after.state == want


def test_create2_salted_address():
    """CREATE2: the address is keccak(0xff ++ creator ++ salt ++
    keccak(init))[12:], independent of the creator nonce."""
    code = contract_asm("""
global a_main:
    PUSH 0x5157        // salt
    PUSH 33            // size
    PUSH 0             // offset
    PUSH 0             // value
    CREATE2
    PUSH 1
    SSTORE             // storage[1] = new address
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    init_hash = keccak256(b"\x00" * 33)
    pre = b"\xff" + CONTRACT + (0x5157).to_bytes(32, "big") + init_hash
    new_addr = keccak256(pre)[12:]
    want = _create_expected_state(
        inputs, {7: 42, 1: int.from_bytes(new_addr, "big")},
        a_nonce=2, a_balance=1000,
        created=(new_addr, 1, 0, mpt.EMPTY_CODE_HASH))
    assert pv.trie_roots_after.state == want


# ----------------------------------------- gas fidelity + selfdestruct

def test_sstore_zero_deletes_slot_and_refunds():
    """SSTORE(slot, 0) on a live slot DELETES the trie key (EVM zero-
    store semantics, round-5 mpt_delete) and accrues the EIP-3529 4800
    refund, which caps at total/5 in the receipt."""
    code = contract_asm("""
global ctr_main:
    PUSH 0
    PUSH 7
    SSTORE             // clear the pre-seeded slot 7 (42 -> absent)
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want_state = expected_after_state(inputs, {}, txn_reverted=False)
    assert pv.trie_roots_after.state == want_state
    # refund-adjusted receipt
    from plonky2_tpu.zkevm.kernel.aggregator import GLOBAL_REFUND
    gas = int(sim.memory[(0, SEG_GLOBAL, GLOBAL_GAS_USED)])
    refund = int(sim.memory.get((0, SEG_GLOBAL, GLOBAL_REFUND), 0))
    assert refund == 4800
    total = inputs.txn.intrinsic_gas() + gas
    capped = min(refund, total // 5)
    _, want_rcpt = expected_txn_receipt_roots(inputs.txn, 1, gas - capped)
    assert pv.trie_roots_after.receipts == want_rcpt


def test_sstore_revert_restores_deleted_slot():
    """A frame that clears a slot then REVERTs gets the slot back via
    @J_STORAGE value-replay, and the refund counter rolls back too."""
    code = contract_asm("""
global ctr_main:
    PUSH 0
    PUSH 7
    SSTORE
    PUSH 0
    PUSH 0
    REVERT
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 1
    from plonky2_tpu.zkevm.kernel.aggregator import GLOBAL_REFUND
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_REFUND), 0) == 0
    want_state = expected_after_state(inputs, {7: 42}, txn_reverted=True)
    assert pv.trie_roots_after.state == want_state


def test_selfdestruct_sweeps_balance():
    """SELFDESTRUCT sends the whole balance to the beneficiary operand
    and halts the frame with success; the account itself survives with
    its storage (EIP-6780 reduced)."""
    code = contract_asm("""
global ctr_main:
    CALLER
    SELFDESTRUCT
""")
    inputs = make_inputs(code, txn_value=5)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    txn = inputs.txn
    fee = txn.gas_price * txn.intrinsic_gas()
    sa = storage_with({7: 42})
    chash = next(iter(inputs.contract_code))
    state = mpt.Empty()
    # sender gets the contract's whole balance (1000 + the 5 sent)
    state = mpt.trie_insert(
        state, mpt.state_key(SENDER),
        mpt.Account(nonce=4,
                    balance=10 ** 18 - fee - 5 + 1005).encode())
    state = mpt.trie_insert(
        state, mpt.state_key(CONTRACT),
        mpt.Account(nonce=1, balance=0,
                    storage_root=mpt.trie_hash(sa),
                    code_hash=chash).encode())
    state = mpt.trie_insert(state, mpt.state_key(BENEFICIARY),
                            mpt.Account(balance=fee).encode())
    assert pv.trie_roots_after.state == mpt.trie_hash(state)


def test_inner_call_oog_child_fails():
    """Forwarding too little gas makes the child frame exceed its 63/64
    cap: it fails AT EXIT like an exceptional halt — CALL returns 0 and
    the child's writes and the value transfer unwind."""
    code_a = contract_asm("""
global a_main:
    PUSH 32            // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 7             // value
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 100           // gas: far below the child's 20000 SSTORE
    CALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // A.storage[1] = status + 1 = 1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    CALLVALUE
    PUSH 5
    SSTORE             // 20000 gas > the ~2400 forwarded: OOG at exit
    STOP
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 1}, b_slots={}, b_balance=50,
        a_value_delta=0)
    assert pv.trie_roots_after.state == want


def test_msize_and_memory_expansion():
    """MSIZE reflects the high-water word count across MAIN and BYTES
    accesses; memory expansion charges the quadratic schedule into the
    frame gas (observable: the txn still proves and MSIZE lands in
    storage)."""
    code = contract_asm("""
global ctr_main:
    MSIZE
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // storage[1] = 0 + 1 (fresh frame: MSIZE = 0)
    PUSH 99
    PUSH 9
    MSTORE             // word 9 -> memory = 10 words = 320 bytes
    MSIZE
    PUSH 2
    SSTORE             // storage[2] = 320
    PUSH 7
    PUSH 1000
    MSTORE8            // byte 1000 -> ceil(1001/32) = 32 words
    MSIZE
    PUSH 3
    SSTORE             // storage[3] = 1024
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = expected_after_state(
        inputs, {7: 42, 1: 1, 2: 320, 3: 1024}, txn_reverted=False)
    assert pv.trie_roots_after.state == want


def test_precompile_bn_add_and_mul():
    """CALLs to 0x06 (bn_add) and 0x07 (bn_mul): in-kernel Jacobian
    ladders on the FP254 native lanes with one checked Z-inverse hint
    each (kernel/asm/bn_curve.asm), results pinned against the host
    oracle (zkevm/bn254.py)."""
    from plonky2_tpu.zkevm import bn254

    G = (1, 2)
    twoG = bn254.bn_add_result(G, G)
    fiveG = bn254.bn_mul_result(G, 5)

    code_a = contract_asm(f"""
global a_main:
    // ---- bn_add(G, G): write [x1 y1 x2 y2] at BYTES[0..128)
    PUSH 1
    PUSH 31
    MSTORE8            // x1 = 1 (big-endian low byte at offset 31)
    PUSH 2
    PUSH 63
    MSTORE8            // y1 = 2
    PUSH 1
    PUSH 95
    MSTORE8            // x2 = 1
    PUSH 2
    PUSH 127
    MSTORE8            // y2 = 2
    PUSH 64            // retSize
    PUSH 128           // retOff
    PUSH 128           // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 6             // addr: bn_add
    PUSH 100000        // gas
    CALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // storage[1] = status + 1 = 2
    // 2G.x from returndata -> storage[2]
    PUSH 0
    CALLDATALOAD       // (placeholder pop target)
    POP
    PUSH 0
    RETURNDATASIZE
    PUSH 2
    SSTORE             // storage[2] = 64
    POP
    // read back 2G.x via MLOAD over the copied bytes is word-granular;
    // instead bn_mul(G, 5) and compare in storage
    // ---- bn_mul(G, 5): [x y s] at BYTES[256..352)
    PUSH 1
    PUSH 287
    MSTORE8            // x = 1
    PUSH 2
    PUSH 319
    MSTORE8            // y = 2
    PUSH 5
    PUSH 351
    MSTORE8            // s = 5
    PUSH 64            // retSize
    PUSH 384           // retOff
    PUSH 96            // argsSize
    PUSH 256           // argsOff
    PUSH 0             // value
    PUSH 7             // addr: bn_mul
    PUSH 100000        // gas
    CALL
    PUSH 1
    ADD
    PUSH 3
    SSTORE             // storage[3] = status + 1 = 2
    STOP
""")
    inputs = make_inputs(code_a, txn_value=0)
    inputs.extra_prover_inputs = (
        bn254.bn_add_kernel_hints(G, G) + bn254.bn_mul_kernel_hints(G, 5))
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    # the LAST call's returndata (bn_mul) sits in (0, SEG_RETURNDATA)
    got_x = int.from_bytes(
        bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
              for i in range(32)), "big")
    got_y = int.from_bytes(
        bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
              for i in range(32, 64)), "big")
    assert (got_x, got_y) == fiveG
    # and bn_add's result was copied into the caller's BYTES[128..192)
    copied_x = int.from_bytes(
        bytes(int(sim.memory.get((1, 4, 128 + i), 0))  # (ctx1, SEG_BYTES)
              for i in range(32)), "big")
    assert copied_x == twoG[0]
    want = expected_after_state(inputs, {7: 42, 1: 2, 2: 64, 3: 2},
                                txn_reverted=False)
    assert pv.trie_roots_after.state == want


def test_precompile_sha256():
    """CALL to 0x02: the in-kernel SHA-256 (32-bit lanes on the 256-bit
    ALU, kernel/asm/sha256.asm) matches the standard digest, including
    the padding-boundary and multi-block cases pinned in its
    development harness."""
    import hashlib

    code = contract_asm("""
global a_main:
    PUSH 0x61
    PUSH 0
    MSTORE8
    PUSH 0x62
    PUSH 1
    MSTORE8
    PUSH 0x63
    PUSH 2
    MSTORE8
    PUSH 32            // retSize
    PUSH 32            // retOff
    PUSH 3             // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 2             // addr: sha256
    PUSH 1000000       // gas
    CALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // storage[1] = 2
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    got = bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
                for i in range(32))
    assert got == hashlib.sha256(b"abc").digest()
    want = expected_after_state(inputs, {7: 42, 1: 2},
                                txn_reverted=False)
    assert pv.trie_roots_after.state == want


def test_precompile_blake2f():
    """CALL to 0x09 (EIP-152 BLAKE2b F): 64-bit lanes on the 256-bit
    ALU with the packed-nibble SIGMA schedule (kernel/asm/blake2f.asm);
    a full 12-round single-block compression reproduces
    hashlib.blake2b."""
    import hashlib

    IV0 = 0x6A09E667F3BCC908
    h0 = [IV0 ^ 0x01010040, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
          0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
          0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179]
    msg = b"abc"
    inp = (12).to_bytes(4, "big")
    inp += b"".join(x.to_bytes(8, "little") for x in h0)
    inp += msg + b"\x00" * (128 - len(msg))
    inp += (3).to_bytes(8, "little") + (0).to_bytes(8, "little") + b"\x01"
    assert len(inp) == 213
    stores = "\n".join(f"    PUSH {b}\n    PUSH {i}\n    MSTORE8"
                       for i, b in enumerate(inp) if b)
    code = contract_asm(f"""
global a_main:
{stores}
    PUSH 64            // retSize
    PUSH 1024          // retOff
    PUSH 213           // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 9             // addr: blake2f
    PUSH 10000000      // gas
    CALL
    POP
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    got = bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
                for i in range(64))
    assert got == hashlib.blake2b(b"abc", digest_size=64).digest()


# ------------------------------------- DELEGATECALL / STATICCALL

def test_delegatecall_runs_callee_code_in_caller_frame():
    """A DELEGATECALLs B: B's code executes with A's storage, address,
    caller and callvalue; no value moves (core/call.asm
    sys_delegatecall semantics)."""
    code_a = contract_asm("""
global a_main:
    PUSH 0             // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000       // gas
    DELEGATECALL       // -> status
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // A.storage[1] = status + 1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    PUSH 77
    PUSH 5
    SSTORE             // lands in A's storage (delegated frame)
    CALLVALUE
    PUSH 6
    SSTORE             // A's own callvalue (the txn value 5), not 0
    ADDRESS
    PUSH 8
    SSTORE             // executing address reads as A
    CALLER
    PUSH 9
    SSTORE             // A's caller (the txn sender) persists
    STOP
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs,
        a_slots={7: 42, 1: 2, 5: 77, 6: 5,
                 8: int.from_bytes(CONTRACT, "big"),
                 9: int.from_bytes(SENDER, "big")},
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want


def test_staticcall_reads_and_returns():
    """A STATICCALLs B: B runs with zero callvalue, can build and RETURN
    returndata; A observes status 1 and the returndata size."""
    code_a = contract_asm("""
global a_main:
    PUSH 1             // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000       // gas
    STATICCALL         // -> status
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // A.storage[1] = status + 1 = 2
    RETURNDATASIZE
    PUSH 2
    SSTORE             // A.storage[2] = 1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    CALLVALUE          // 0 inside a static frame
    PUSH 42
    ADD
    PUSH 0
    MSTORE8
    PUSH 1
    PUSH 0
    RETURN
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    assert sim.memory.get((0, SEG_RETURNDATA, 0), 0) == 42
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 2, 2: 1},
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want


def test_staticcall_sstore_faults_child():
    """SSTORE inside a static frame is an exceptional halt of that frame
    (EIP-214): the STATICCALL returns 0, the transaction succeeds."""
    code_a = contract_asm("""
global a_main:
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000
    STATICCALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // status + 1 = 1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    PUSH 9
    PUSH 5
    SSTORE             // static violation -> frame fault
    STOP
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 1},
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want


def test_static_value_call_faults():
    """A value-bearing CALL issued from inside a static frame faults
    that frame at sys_call entry (EIP-214 value check)."""
    code_a = contract_asm("""
global a_main:
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000
    STATICCALL
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // status + 1 = 1 (B faulted)
    STOP
""")
    code_b = contract_asm("""
global b_main:
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 1             // value != 0: forbidden under static
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 100000
    CALL
    STOP
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs, a_slots={7: 42, 1: 1},
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want


@pytest.mark.parametrize("msg,want_hex", [
    (b"", "9c1185a5c5e9fc54612808977ee8f548b2258d31"),
    (b"abc", "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"),
    # 80 bytes: exercises the multi-block path (2 x 64-byte blocks)
    (b"1234567890" * 8, "9b752e45573d4b39f4dbd3323cab82bf63326bfb"),
])
def test_precompile_ripemd160(msg, want_hex):
    """CALL to 0x03 (kernel/asm/ripemd160.asm): both 5-round lines over
    little-endian message words; output left-padded to 32 bytes against
    the spec test vectors (Dobbertin/Bosselaers/Preneel 1996)."""
    stores = "\n".join(f"    PUSH {b}\n    PUSH {i}\n    MSTORE8"
                       for i, b in enumerate(msg) if b)
    code = contract_asm(f"""
global a_main:
{stores}
    PUSH 32            // retSize
    PUSH 1024          // retOff
    PUSH {len(msg)}    // argsSize
    PUSH 0             // argsOff
    PUSH 0             // value
    PUSH 3             // addr: ripemd160
    PUSH 10000000      // gas
    CALL
    POP
    STOP
""")
    inputs = make_inputs(code, txn_value=0)
    sim, pv = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    from plonky2_tpu.zkevm.cpu import SEG_RETURNDATA
    got = bytes(sim.memory.get((0, SEG_RETURNDATA, i), 0)
                for i in range(32))
    assert got == b"\x00" * 12 + bytes.fromhex(want_hex)


# ------------------------------------------------- EIP-2929 warm/cold

def _gas_of(src: str) -> int:
    inputs = make_inputs(contract_asm(src), txn_value=0)
    sim, _ = simulate_transfer(inputs, trace=False)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    return int(sim.memory[(0, SEG_GLOBAL, GLOBAL_GAS_USED)])


def test_eip2929_sload_cold_then_warm():
    """Second SLOAD of the SAME slot is warm (100); a different slot is
    cold again (2100) — the 2000 surcharge shows up as a pure gas delta
    between instruction-identical programs (access.asm warm_slot)."""
    def prog(slots):
        body = "\n".join(f"    PUSH {s}\n    SLOAD\n    POP" for s in slots)
        return f"global a_main:\n{body}\n    STOP"
    two_same = _gas_of(prog([7, 7]))
    two_diff = _gas_of(prog([7, 8]))
    assert two_diff - two_same == 2000


def test_eip2929_call_cold_then_warm():
    """Second zero-value CALL to the same (codeless, absent) address is
    warm: the instruction-identical two-address variant pays the 2500
    cold-account surcharge once more (access.asm warm_addr)."""
    def prog(addrs):
        calls = "\n".join(f"""    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH 0
    PUSH {a}
    PUSH 100000
    CALL
    POP""" for a in addrs)
        return f"global a_main:\n{calls}\n    STOP"
    b1 = 0x2000000000000000000000000000000000000001
    b2 = 0x2000000000000000000000000000000000000002
    g_same = _gas_of(prog([b1, b1]))
    g_diff = _gas_of(prog([b1, b2]))
    assert g_diff - g_same == 2500


def test_eip2929_sstore_cold_surcharge():
    """SSTORE pays +2100 on a cold slot; an SLOAD first warms it
    (the EVM's one shared warm set for both opcodes)."""
    warm_first = _gas_of("""global a_main:
    PUSH 7
    SLOAD
    POP
    PUSH 100
    PUSH 7
    SSTORE
    STOP""")
    cold_direct = _gas_of("""global a_main:
    PUSH 8
    SLOAD
    POP
    PUSH 100
    PUSH 7
    SSTORE
    STOP""")
    # both programs SLOAD one cold slot + SSTORE slot 7; only the second
    # pays the SSTORE cold surcharge
    assert cold_direct - warm_first == 2100


def test_callcode_caller_storage_own_value():
    """A CALLCODEs B with value 3: B's code runs against A's storage and
    address, CALLVALUE reads the operand, CALLER reads A itself, and no
    balance moves (self-transfer)."""
    code_a = contract_asm("""
global a_main:
    PUSH 0             // retSize
    PUSH 0             // retOff
    PUSH 0             // argsSize
    PUSH 0             // argsOff
    PUSH 3             // value (self-to-self; must not move balances)
    PUSH 0x1000000000000000000000000000000000000001
    PUSH 1000000       // gas
    CALLCODE           // -> status
    PUSH 1
    ADD
    PUSH 1
    SSTORE             // A.storage[1] = status + 1
    STOP
""")
    code_b = contract_asm("""
global b_main:
    PUSH 88
    PUSH 5
    SSTORE             // lands in A's storage
    CALLVALUE
    PUSH 6
    SSTORE             // the CALLCODE value operand (3)
    CALLER
    PUSH 9
    SSTORE             // A's own address, NOT the txn sender
    STOP
""")
    inputs = make_two_contract_inputs(code_a, code_b)
    sim, pv = simulate_transfer(inputs)
    assert sim.memory.get((0, SEG_GLOBAL, GLOBAL_TXN_FAILED), 0) == 0
    want = _two_contract_expected(
        inputs,
        a_slots={7: 42, 1: 2, 5: 88, 6: 3,
                 9: int.from_bytes(CONTRACT, "big")},
        b_slots={}, b_balance=50, a_value_delta=0)
    assert pv.trie_roots_after.state == want
