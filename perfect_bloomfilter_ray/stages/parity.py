"""XOR parity shards — single-erasure recovery for partitioned output.

The RAID-5 idea applied to the resumable-parquet layout every sink here
writes: alongside ``k`` data shards, publish ONE parity file holding the
bytewise XOR of the (length-padded) shard payloads.  Any single lost or
corrupted shard is then reconstructed exactly as the XOR of the parity
with the surviving shards — no re-run of the pipeline that produced it.
The write-side cost is one streaming XOR fold (vectorized uint64 view);
recovery is the same fold.  Multi-erasure needs Reed-Solomon (out of
scope — documented); the single-erasure case covers the common
lost-one-object failure and composes with the per-shard resume contract
(a recovered shard is byte-identical, so downstream fingerprints and
skip-finished checks keep working).
"""

from __future__ import annotations

import json
import os

import numpy as np

_META = "_parity.json"


def _xor_into(acc: np.ndarray, data: bytes) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) > len(acc):
        acc = np.concatenate([acc, np.zeros(len(b) - len(acc), np.uint8)])
    acc[: len(b)] ^= b
    return acc


def write_parity(shard_dir: str, pattern: str = ".parquet") -> list[str]:
    """Publish ``parity.bin`` + manifest for every ``pattern`` file in
    ``shard_dir`` (atomic tmp+rename).  Returns the covered shard names."""
    shards = sorted(
        f for f in os.listdir(shard_dir) if f.endswith(pattern) and not f.startswith(".")
    )
    if not shards:
        raise ValueError(f"no {pattern} shards under {shard_dir}")
    acc = np.zeros(0, np.uint8)
    sizes = {}
    for f in shards:
        data = open(os.path.join(shard_dir, f), "rb").read()
        sizes[f] = len(data)
        acc = _xor_into(acc, data)
    tmp = os.path.join(shard_dir, ".parity.bin.tmp")
    with open(tmp, "wb") as fh:
        fh.write(acc.tobytes())
    os.replace(tmp, os.path.join(shard_dir, "parity.bin"))
    mtmp = os.path.join(shard_dir, _META + ".tmp")
    with open(mtmp, "w") as fh:
        json.dump({"shards": sizes}, fh)
    os.replace(mtmp, os.path.join(shard_dir, _META))
    return shards


def recover_shard(shard_dir: str, lost: str) -> bytes:
    """Reconstruct ``lost`` from parity + the surviving shards; writes the
    file back (atomic) and returns its bytes.  Raises if more than one
    covered shard is missing (single-erasure contract)."""
    meta = json.load(open(os.path.join(shard_dir, _META)))
    sizes = meta["shards"]
    if lost not in sizes:
        raise ValueError(f"{lost!r} is not covered by the parity manifest")
    missing = [
        f for f in sizes if not os.path.exists(os.path.join(shard_dir, f))
    ]
    if missing not in ([], [lost]):
        raise ValueError(f"single-erasure parity cannot recover {missing}")
    acc = np.frombuffer(open(os.path.join(shard_dir, "parity.bin"), "rb").read(), np.uint8).copy()
    for f in sizes:
        if f == lost:
            continue
        acc = _xor_into(acc, open(os.path.join(shard_dir, f), "rb").read())
    data = acc[: sizes[lost]].tobytes()
    tmp = os.path.join(shard_dir, "." + lost + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, os.path.join(shard_dir, lost))
    return data
