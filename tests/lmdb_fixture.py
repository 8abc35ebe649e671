"""Minimal LMDB environment writer — TEST FIXTURE ONLY.

Builds a structurally valid little-endian 64-bit LMDB data file (format
version 1) so tests can exercise soft_intro_vae_tpu.data.lmdb_reader without
the ``lmdb`` package: two meta pages, leaf pages packed in key order, an
optional branch root when more than one leaf is needed, and overflow pages
for values above the inline threshold (exactly the shapes the reader must
handle for LSUN environments). Not a general-purpose writer: single
transaction, no freelist, no DUPSORT.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

MDB_MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
PAGEHDRSZ = 16
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _page_header(pgno: int, flags: int, lower: int, upper: int) -> bytes:
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _overflow_header(pgno: int, npages: int) -> bytes:
    return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, npages)


def _meta_page(pgno: int, psize: int, txnid: int, root: int, entries: int,
               depth: int, last_pg: int) -> bytes:
    body = struct.pack("<IIQQ", MDB_MAGIC, 1, 0, psize * (last_pg + 1))
    # dbs[0] (FREE_DBI): md_pad carries the page size
    body += struct.pack("<IHHQQQQQ", psize, 0, 0, 0, 0, 0, 0, P_INVALID)
    # dbs[1] (MAIN_DBI)
    body += struct.pack("<IHHQQQQQ", 0, 0, depth, 0, 0, 0, entries, root)
    body += struct.pack("<QQ", last_pg, txnid)
    page = _page_header(pgno, P_META, 0, 0) + body
    return page.ljust(psize, b"\0")


def write_lmdb(path: str, items: Sequence[Tuple[bytes, bytes]],
               psize: int = 4096, inline_max: int = 512) -> None:
    """Write ``items`` (key-sorted (key, value) pairs) as an LMDB data file."""
    items = sorted(items)
    next_pgno = 2  # 0 and 1 are the meta pages
    data_pages: List[bytes] = []

    # ---- pass 1: assign overflow pages and group nodes into leaves -------
    leaves: List[List[Tuple[bytes, bytes, int]]] = [[]]  # (key, payload, nflags)
    used = PAGEHDRSZ
    pending_overflows: List[Tuple[int, bytes]] = []  # (pgno, value)

    def node_bytes(key: bytes, payload: bytes, nflags: int, dsize: int) -> bytes:
        n = struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                        nflags, len(key)) + key + payload
        return n + b"\0" * (len(n) & 1)  # even-align like mdb_node_add

    overflow_reserved = 0
    for key, value in items:
        if len(value) > inline_max:
            npages = -(-(PAGEHDRSZ + len(value)) // psize)
            ov_pgno = next_pgno + overflow_reserved  # provisional, fixed below
            payload = struct.pack("<Q", ov_pgno)
            nflags, dsize = F_BIGDATA, len(value)
            pending_overflows.append((npages, value))
            overflow_reserved += npages
        else:
            payload, nflags, dsize = value, 0, len(value)
        nb = node_bytes(key, payload, nflags, dsize)
        if used + 2 + len(nb) > psize and leaves[-1]:
            leaves.append([])
            used = PAGEHDRSZ
        leaves[-1].append((key, payload, (nflags, dsize)))
        used += 2 + len(nb)

    # overflow pages come first in the file so their pgnos are known before
    # leaf nodes are serialized: re-number them starting at 2
    ov_pgnos: List[int] = []
    pg = 2
    for npages, _ in pending_overflows:
        ov_pgnos.append(pg)
        pg += npages
    leaf_pgnos = list(range(pg, pg + len(leaves)))
    root = leaf_pgnos[0] if len(leaves) == 1 else pg + len(leaves)
    depth = 1 if len(leaves) == 1 else 2
    last_pg = root if depth == 2 else leaf_pgnos[-1]

    # ---- serialize overflow pages ----------------------------------------
    for ov_pgno, (npages, value) in zip(ov_pgnos, pending_overflows):
        blob = _overflow_header(ov_pgno, npages) + value
        data_pages.append(blob.ljust(npages * psize, b"\0"))

    # ---- serialize leaves (patching provisional overflow pgnos) ----------
    ov_i = 0
    for leaf_pgno, nodes in zip(leaf_pgnos, leaves):
        blobs = []
        for key, payload, (nflags, dsize) in nodes:
            if nflags & F_BIGDATA:
                payload = struct.pack("<Q", ov_pgnos[ov_i])
                ov_i += 1
            blobs.append(node_bytes(key, payload, nflags, dsize))
        nkeys = len(blobs)
        lower = PAGEHDRSZ + 2 * nkeys
        ptrs, upper = [], psize
        placed = []
        for b in reversed(blobs):
            upper -= len(b)
            placed.append((upper, b))
        for b in blobs:  # ptrs in key order
            off = next(o for o, bb in placed if bb is b)
            ptrs.append(off)
        page = bytearray(psize)
        page[:PAGEHDRSZ] = _page_header(leaf_pgno, P_LEAF, lower, upper)
        struct.pack_into(f"<{nkeys}H", page, PAGEHDRSZ, *ptrs)
        for off, b in placed:
            page[off:off + len(b)] = b
        data_pages.append(bytes(page))

    # ---- branch root ------------------------------------------------------
    if depth == 2:
        blobs = []
        for i, (leaf_pgno, nodes) in enumerate(zip(leaf_pgnos, leaves)):
            key = b"" if i == 0 else nodes[0][0]  # first branch key is empty
            n = struct.pack("<HHHH", leaf_pgno & 0xFFFF,
                            (leaf_pgno >> 16) & 0xFFFF,
                            (leaf_pgno >> 32) & 0xFFFF, len(key)) + key
            blobs.append(n + b"\0" * (len(n) & 1))
        nkeys = len(blobs)
        lower = PAGEHDRSZ + 2 * nkeys
        page = bytearray(psize)
        upper, placed = psize, []
        for b in reversed(blobs):
            upper -= len(b)
            placed.append((upper, b))
        placed.reverse()
        page[:PAGEHDRSZ] = _page_header(root, P_BRANCH, lower, upper)
        struct.pack_into(f"<{nkeys}H", page, PAGEHDRSZ,
                         *[off for off, _ in placed])
        for off, b in placed:
            page[off:off + len(b)] = b
        data_pages.append(bytes(page))

    with open(path, "wb") as f:
        # stale meta 0 (txn 0, empty) + live meta 1 (txn 1) — exercises
        # newest-meta selection in the reader
        f.write(_meta_page(0, psize, 0, P_INVALID, 0, 0, 1))
        f.write(_meta_page(1, psize, 1, root, len(items), depth, last_pg))
        for blob in data_pages:
            f.write(blob)
