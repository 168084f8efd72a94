"""MPT/RLP layer tests: host twins (rlp.py, mpt.py) against known
vectors and each other, and the kernel asm (rlp.asm, mpt.asm) run in
the off-chain interpreter against the host twins (the reference's
kernel-unit-test pattern, evm/src/cpu/kernel/tests/mpt/{load,hash}.rs).
"""

import pytest

from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.zkevm import mpt, rlp
from plonky2_tpu.zkevm.generation import Simulator
from plonky2_tpu.zkevm.kernel.aggregator import build_kernel

# ------------------------------------------------------------ host RLP


def test_rlp_vectors():
    # canonical vectors from the Ethereum wiki spec
    assert rlp.encode(b"dog") == b"\x83dog"
    assert rlp.encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp.encode(b"") == b"\x80"
    assert rlp.encode(0) == b"\x80"
    assert rlp.encode(15) == b"\x0f"
    assert rlp.encode(1024) == b"\x82\x04\x00"
    assert rlp.encode([[], [[]], [[], [[]]]]) == \
        b"\xc7\xc0\xc1\xc0\xc3\xc0\xc1\xc0"
    long = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert rlp.encode(long) == b"\xb8\x38" + long


def test_rlp_roundtrip():
    items = [b"", b"\x01", b"\x80", b"abc" * 40,
             [b"x", [b"y", b"z" * 60], b""]]
    for item in items:
        assert rlp.decode(rlp.encode(item)) == item


# ----------------------------------------------------------- host trie


def test_empty_trie_root():
    # the canonical empty root hash
    assert mpt.EMPTY_TRIE_ROOT.hex() == \
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"


def test_single_leaf_matches_spec():
    # hand-computed: trie {0x010102 (3 nibbles? no — bytes)} — use a
    # known single-entry vector: key=b'A' (0x41), value=b'v'
    key = mpt.bytes_to_nibbles(b"A")
    t = mpt.trie_insert(mpt.Empty(), key, b"v")
    enc = rlp.encode([mpt.hex_prefix(key, True), b"v"])
    assert mpt.trie_hash(t) == keccak256(enc)


def test_insert_get_many():
    t = mpt.Empty()
    kv = {bytes([i, 7 * i % 256, 3]): bytes([i]) * (i % 40 + 1)
          for i in range(60)}
    for k, v in kv.items():
        t = mpt.trie_insert(t, mpt.bytes_to_nibbles(k), v)
    for k, v in kv.items():
        assert mpt.trie_get(t, mpt.bytes_to_nibbles(k)) == v
    # insertion order must not matter
    t2 = mpt.Empty()
    for k in sorted(kv, reverse=True):
        t2 = mpt.trie_insert(t2, mpt.bytes_to_nibbles(k), kv[k])
    assert mpt.trie_hash(t) == mpt.trie_hash(t2)


def test_branch_value_and_prefix_keys():
    t = mpt.Empty()
    t = mpt.trie_insert(t, (1, 2), b"ab")
    t = mpt.trie_insert(t, (1, 2, 3, 4), b"cd")   # extends through leaf
    t = mpt.trie_insert(t, (1,), b"ef")
    assert mpt.trie_get(t, (1, 2)) == b"ab"
    assert mpt.trie_get(t, (1, 2, 3, 4)) == b"cd"
    assert mpt.trie_get(t, (1,)) == b"ef"
    assert mpt.trie_get(t, (1, 2, 3)) is None


def test_hex_prefix():
    # yellow paper appendix C examples
    assert mpt.hex_prefix((1, 2, 3, 4, 5), False) == bytes.fromhex("112345")
    assert mpt.hex_prefix((0, 1, 2, 3, 4, 5), False) == \
        bytes.fromhex("00012345")
    assert mpt.hex_prefix((0, 15, 1, 12, 11, 8), True) == \
        bytes.fromhex("200f1cb8")
    assert mpt.hex_prefix((15, 1, 12, 11, 8), True) == \
        bytes.fromhex("3f1cb8")


# ------------------------------------------- kernel asm vs host twins

MAIN_HASH_TRIES = """
global main:
    PUSH lat_done
    %jump(load_all_tries)
lat_done:
    PUSH hst_done
    %jump(hash_state_trie)
hst_done:
    // stack: state_digest_le
    PUSH htt_done
    %jump(hash_txn_trie)
htt_done:
    // stack: txn_digest_le, state_digest_le
    PUSH hrt_done
    %jump(hash_receipt_trie)
hrt_done:
    // stack: receipt_digest_le, txn_digest_le, state_digest_le
    HALT
"""


def _digest_word(digest: bytes) -> int:
    return int.from_bytes(digest, "little")


def _run_hash_tries(trie_inputs: mpt.TrieInputs, max_cycles=4_000_000):
    kernel = build_kernel(main_source=MAIN_HASH_TRIES)
    inputs = mpt.state_prover_inputs(trie_inputs)
    sim = Simulator(kernel=kernel, prover_inputs=inputs, trace=False,
                    max_cycles=max_cycles)
    sim.run()
    receipt_d, txn_d, state_d = sim.final_stack[-1], sim.final_stack[-2], \
        sim.final_stack[-3]
    return state_d, txn_d, receipt_d


def _check(trie_inputs: mpt.TrieInputs):
    state_d, txn_d, receipt_d = _run_hash_tries(trie_inputs)
    assert state_d == _digest_word(mpt.trie_hash(trie_inputs.state_trie))
    assert txn_d == _digest_word(
        mpt.trie_hash(trie_inputs.transactions_trie))
    assert receipt_d == _digest_word(
        mpt.trie_hash(trie_inputs.receipts_trie))


def test_kernel_hash_empty_tries():
    _check(mpt.TrieInputs())


def test_kernel_hash_state_trie_accounts():
    t = mpt.Empty()
    addrs = [bytes([i]) * 20 for i in (1, 2, 3)]
    for i, a in enumerate(addrs):
        acct = mpt.Account(nonce=i, balance=10 ** 18 * (i + 1))
        t = mpt.trie_insert(t, mpt.state_key(a), acct.encode())
    _check(mpt.TrieInputs(state_trie=t))


def test_kernel_hash_account_with_storage():
    saddr = bytes([9]) * 20
    storage = mpt.Empty()
    slots = {1: 0xdeadbeef, 2 ** 200: 7, 5: 2 ** 255 - 19}
    for slot, val in slots.items():
        key = mpt.bytes_to_nibbles(keccak256(slot.to_bytes(32, "big")))
        storage = mpt.trie_insert(storage, key, rlp.encode(val))
    acct = mpt.Account(nonce=1, balance=55,
                       storage_root=mpt.trie_hash(storage))
    t = mpt.trie_insert(mpt.Empty(), mpt.state_key(saddr), acct.encode())
    _check(mpt.TrieInputs(state_trie=t,
                          storage_tries=[(mpt.state_key(saddr), storage)]))


def test_kernel_hash_trie_with_hash_nodes():
    """Partial trie: unexplored subtrees as Hash nodes must contribute
    their digests without being traversed."""
    full = mpt.Empty()
    for i in range(8):
        acct = mpt.Account(nonce=i, balance=i * 1000 + 1)
        full = mpt.trie_insert(full, mpt.state_key(bytes([i + 1]) * 20),
                               acct.encode())
    root_digest = mpt.trie_hash(full)
    # replace every branch child below the root with its hash
    assert isinstance(full, mpt.Branch)
    pruned_children = []
    for child in full.children:
        if isinstance(child, mpt.Empty):
            pruned_children.append(child)
        else:
            pruned_children.append(mpt.Hash(mpt.trie_hash(child)))
    pruned = mpt.Branch(pruned_children and tuple(pruned_children),
                        full.value)
    assert mpt.trie_hash(pruned) == root_digest
    state_d, _, _ = _run_hash_tries(mpt.TrieInputs(state_trie=pruned))
    assert state_d == _digest_word(root_digest)


def test_kernel_hash_txn_receipt_tries():
    txn_trie = mpt.Empty()
    receipts = mpt.Empty()
    for i in range(3):
        key = mpt.bytes_to_nibbles(rlp.encode(i))
        txn_trie = mpt.trie_insert(txn_trie, key,
                                   rlp.encode([i, 21000, b"\x01" * 20]))
        receipts = mpt.trie_insert(receipts, key,
                                   rlp.encode([1, 21000 * (i + 1), b""]))
    _check(mpt.TrieInputs(transactions_trie=txn_trie,
                          receipts_trie=receipts))


# -------------------------------------------------- kernel mpt_delete

MAIN_DELETE = """
global main:
    PUSH lat_done
    %jump(load_all_tries)
lat_done:
    PROVER_INPUT                 // n_dels
del_loop:
    DUP1
    ISZERO
    %jumpi(del_done)
    PUSH 1
    SWAP1
    SUB
    PROVER_INPUT                 // count
    PROVER_INPUT                 // packed
    %mload_global(@GLOBAL_STATE_TRIE_PTR)
    %stack (state, packed, count, n) -> (state, count, packed, del_1, n)
    %jump(mpt_delete)
del_1:
    // stack: newstate, n
    %mstore_global(@GLOBAL_STATE_TRIE_PTR)
    %jump(del_loop)
del_done:
    POP
    PUSH hst_done
    %jump(hash_state_trie)
hst_done:
    HALT
"""


def _run_delete(trie_inputs: mpt.TrieInputs, keys: list) -> int:
    kernel = build_kernel(main_source=MAIN_DELETE)
    pin = mpt.state_prover_inputs(trie_inputs) + [len(keys)]
    for k in keys:
        pin += [len(k), mpt.pack_nibbles(k)]
    sim = Simulator(kernel=kernel, prover_inputs=pin, trace=False,
                    max_cycles=4_000_000)
    sim.run()
    return sim.final_stack[-1]


def test_kernel_mpt_delete_matches_host():
    """In-kernel deletion (mpt_ops.asm mpt_delete: branch collapse +
    extension merge) against the host twin, across a churn that
    exercises leaf removal, single-child collapse and ext merging."""
    import random
    rng = random.Random(11)
    addrs = [bytes([rng.randrange(256) for _ in range(20)])
             for _ in range(12)]
    t = mpt.Empty()
    for i, a in enumerate(addrs):
        t = mpt.trie_insert(t, mpt.state_key(a),
                            mpt.Account(nonce=i, balance=1000 + i).encode())
    for ndel in (1, 5, 11, 12):
        keys = [mpt.state_key(a) for a in addrs[:ndel]]
        host = t
        for k in keys:
            host = mpt.trie_delete(host, k)
        got = _run_delete(mpt.TrieInputs(state_trie=t), keys)
        assert got == _digest_word(mpt.trie_hash(host)), ndel


def test_kernel_mpt_delete_missing_key_is_identity():
    a = bytes(range(20))
    t = mpt.trie_insert(mpt.Empty(), mpt.state_key(a),
                        mpt.Account(nonce=1, balance=2).encode())
    other = mpt.state_key(bytes(range(1, 21)))
    got = _run_delete(mpt.TrieInputs(state_trie=t), [other])
    assert got == _digest_word(mpt.trie_hash(t))
