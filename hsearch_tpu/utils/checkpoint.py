"""Index serialization: build once, search forever.

The reference contemplated DB-index serialization but never wrote it
(the ``//serialize`` comment, hash_search.cpp:254); its de facto
checkpoints are the text files between pipeline stages.  Here every index
round-trips through one ``.npz`` file (arrays + a small json header), so
a multi-hour corpus build is paid once per corpus, not per query session.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

def save_index(path: str, index) -> None:
    """Serialize a MotifIndex / IVFIndex / SeedIndex / SegmentedIVF to
    ``path`` (.npz)."""
    from ..search import ivf, motif, stream
    from ..align import seed_index as si
    from ..lsh import pstable
    from ..ops import segment

    if isinstance(index, stream.SegmentedIVF):
        # the host byte set IS the checkpoint (~29 B/point): per-segment
        # block-sorted int8 rows + int32 order maps.  host_kmers and the
        # device-side bounds are derived (unsort_blocks at load,
        # _recompute_bounds at upload).  Plain savez, not compressed:
        # the 2^27 byte set is ~4.4 GB and the index rows are
        # high-entropy — compression buys little and costs minutes.
        arrays = {}
        for i, s in enumerate(index.segments):
            arrays[f"seg{i}_db"] = s.db_sorted
            arrays[f"seg{i}_order"] = s.order
        np.savez(path, __kind__="segivf",
                 meta=json.dumps({
                     "n_points": index.n_points,
                     "kmer_len": index.kmer_len,
                     "block_size": index.block_size,
                     "segments": [{"offset": s.offset,
                                   "n_points": s.n_points}
                                  for s in index.segments]}),
                 **arrays)
    elif isinstance(index, motif.MotifIndex):
        np.savez_compressed(
            path, __kind__="motif",
            meta=json.dumps({"cand_max": index.cand_max,
                             "w": index.params.w,
                             "pack_bits": index.params.pack_bits}),
            a=np.asarray(index.params.a), b=np.asarray(index.params.b),
            sorted_codes=np.asarray(index.tables.sorted_codes),
            perm=np.asarray(index.tables.perm),
            db_kmers=np.asarray(index.db_kmers))
    elif isinstance(index, ivf.IVFIndex):
        np.savez_compressed(
            path, __kind__="ivf",
            meta=json.dumps({"n_points": index.n_points,
                             "kmer_len": index.kmer_len}),
            db_sorted=np.asarray(index.db_sorted),
            order=np.asarray(index.order),
            block_centroid=np.asarray(index.block_centroid),
            block_radius=np.asarray(index.block_radius))
    elif isinstance(index, si.SeedIndex):
        extra = {}
        if index.group_starts is not None:
            # without this a round-tripped group-partitioned index would
            # silently probe across group boundaries (superset hit sets)
            extra["group_starts"] = np.asarray(index.group_starts)
        np.savez_compressed(
            path, __kind__="seed", meta=json.dumps({}),
            sorted_codes=np.asarray(index.sorted_codes),
            positions=np.asarray(index.positions),
            seq=np.asarray(index.seq), starts=np.asarray(index.starts),
            **extra)
    else:
        raise TypeError(f"unknown index type {type(index)}")


def load_index(path: str, device_budget_bytes: int = 0):
    """Load an index saved by save_index; arrays land on the default
    device lazily on first use.

    device_budget_bytes applies to segmented indexes only: leading
    segments are re-pinned device-resident under the (clamped) budget
    via ``stream.set_residency`` — a loaded index is otherwise fully
    host-resident/streamed."""
    from ..search import ivf, motif, stream
    from ..align import seed_index as si
    from ..lsh import pstable
    from ..ops import segment

    z = np.load(path, allow_pickle=False)
    kind = str(z["__kind__"])
    meta = json.loads(str(z["meta"]))
    if kind == "segivf":
        segs = []
        for i, sm in enumerate(meta["segments"]):
            db = z[f"seg{i}_db"]
            order = z[f"seg{i}_order"]
            n = int(sm["n_points"])
            l = int(meta["kmer_len"])
            segs.append(stream.HostSegment(
                offset=int(sm["offset"]), n_points=n, kmer_len=l,
                db_sorted=db, order=order,
                host_kmers=ivf.unsort_blocks(order, db, n, l, np.int8)))
        sidx = stream.SegmentedIVF(
            segments=segs, n_points=int(meta["n_points"]),
            kmer_len=int(meta["kmer_len"]),
            block_size=int(meta["block_size"]),
            resident=[None] * len(segs))
        if device_budget_bytes:
            stream.set_residency(sidx, device_budget_bytes)
        return sidx
    if kind == "motif":
        params = pstable.PStableParams(
            a=jnp.asarray(z["a"]), b=jnp.asarray(z["b"]),
            w=float(meta["w"]), pack_bits=int(meta["pack_bits"]))
        tables = segment.SortedTables(
            sorted_codes=jnp.asarray(z["sorted_codes"]),
            perm=jnp.asarray(z["perm"]))
        return motif.MotifIndex(params=params, tables=tables,
                                db_kmers=jnp.asarray(z["db_kmers"]),
                                cand_max=int(meta["cand_max"]))
    if kind == "ivf":
        n_points = int(meta["n_points"])
        ds = z["db_sorted"]
        if ds.ndim == 3:               # legacy rank-3 (B, bs, L) layout
            kmer_len = int(ds.shape[2])
            ds = ds.reshape(ds.shape[0], -1)
        else:
            kmer_len = int(meta["kmer_len"])
        # rebuild the host-side k-mer copy from the (already host) npz
        # arrays — enables the 1-word packed hit transfer (see
        # ivf.build_index); costs one O(N) memcpy, no device traffic
        host_km = ivf.HostArray(ivf.unsort_blocks(
            z["order"], ds, n_points, kmer_len, np.int8))
        return ivf.IVFIndex(
            db_sorted=jnp.asarray(ds),
            order=jnp.asarray(z["order"]),
            block_centroid=jnp.asarray(z["block_centroid"]),
            block_radius=jnp.asarray(z["block_radius"]),
            n_points=n_points, host_kmers=host_km, kmer_len=kmer_len)
    if kind == "seed":
        seq = np.asarray(z["seq"])
        starts = np.asarray(z["starts"])
        gs = jnp.asarray(z["group_starts"]) if "group_starts" in z \
            else None
        return si.SeedIndex(
            sorted_codes=jnp.asarray(z["sorted_codes"]),
            positions=jnp.asarray(z["positions"]),
            seq=jnp.asarray(seq), starts=jnp.asarray(starts),
            group_starts=gs,
            g10_at=jnp.asarray(si.g10_table(seq, starts)))
    raise ValueError(f"unknown index kind {kind!r} in {path}")
