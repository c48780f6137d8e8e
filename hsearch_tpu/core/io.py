"""Text-format IO matching the reference pipeline's on-disk formats.

The reference is a pipeline of binaries communicating via text files; to be
a drop-in replacement these formats are preserved:

  * FASTA protein databases (smithlab_os read_fasta_file / protein.hpp ctor).
  * "data points" files: a header line
    ``name#proteinIdx$offset@KMER*count`` followed by one line of 8L floats
    (protein2datapoints.cpp:61-65); readers also accept arbitrary header
    lines (motif_both_points.cpp:344-353 treats the first line opaquely).
  * hit "triples": ``center kmer distance`` per line
    (motif_both_points.cpp:239-242).
  * cluster files: ``#clusterid:<i>:size<n>`` blocks of member names
    (hclust2.cpp:137-150) and ``#cluster<i>`` blocks (hclust.cpp:302-309).

Inside the framework, data never round-trips through text between stages —
sequences stay as integer arrays and points as device arrays; these readers
and writers exist at the pipeline boundary only.
"""

from __future__ import annotations

import dataclasses
import io as _io
import re

import numpy as np

from . import alphabet


@dataclasses.dataclass
class ProteinDB:
    """A FASTA database as concatenated index arrays.

    Equivalent of hclust/src/hclust/protein.hpp:7-72 / pcluster
    read_proteins.cpp:6-41: names, per-protein lengths, one concatenated
    residue array and start offsets.  Unknown residues are randomized with
    the given seed (the reference used an unseeded rand(); protein.hpp:59-63).
    """

    names: list[str]
    seq: np.ndarray           # concatenated uint8 AA indices
    starts: np.ndarray        # (P+1,) int64 offsets into seq

    @property
    def num_proteins(self) -> int:
        return len(self.names)

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.starts)

    def protein(self, i: int) -> np.ndarray:
        return self.seq[self.starts[i]:self.starts[i + 1]]

    def protein_id(self, pos: int) -> int:
        """Binary search position -> protein id (protein.hpp:28-39)."""
        return int(np.searchsorted(self.starts, pos, side="right") - 1)


def read_fasta(path_or_file, *, seed: int | None = 0,
               name_upto_space: bool = True,
               drop_non_alpha: bool = True) -> ProteinDB:
    """Read a FASTA file into a ProteinDB.

    seed=None keeps INVALID residues (no randomization); otherwise unknown
    alphabetic residues are replaced with seeded-random AAs as the reference
    does at read time (read_proteins.cpp:27-33).
    """
    if isinstance(path_or_file, (str, bytes)) and name_upto_space \
            and drop_non_alpha:
        # native single-pass parser (hsearch_native.cpp hs_parse_fasta)
        from .. import native_ext
        if native_ext.available():
            with open(path_or_file, "rb") as fh:
                parsed = native_ext.parse_fasta_bytes(fh.read())
            if parsed is not None:
                names, seq, starts = parsed
                # the native lut emits 20 for unknown alphabetics; fold to
                # INVALID so both parsers randomize (or keep) identically
                seq = np.where(seq == 20, np.uint8(alphabet.INVALID), seq)
                if seed is not None:
                    seq = alphabet.randomize_unknown_at(seq, seed)
                return ProteinDB(names=names, seq=seq,
                                 starts=starts.astype(np.int64))
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    names: list[str] = []
    chunks: list[np.ndarray] = []
    starts = [0]
    cur: list[bytes] = []
    total = 0

    def _flush():
        nonlocal total
        if not names:
            cur.clear()      # text before the first '>' is not sequence
            return
        raw = b"".join(cur)
        if drop_non_alpha:
            raw = bytes(c for c in raw if (65 <= (c & ~32) <= 90))
        idx = alphabet.encode(raw)
        chunks.append(idx)
        total += len(idx)
        starts.append(total)
        cur.clear()

    try:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                _flush()
                name = line[1:]
                if name_upto_space:
                    name = name.split(" ", 1)[0]
                names.append(name)
            else:
                cur.append(line.encode())
        _flush()
    finally:
        if close:
            f.close()

    seq = np.concatenate(chunks) if chunks else np.empty(0, np.uint8)
    if seed is not None:
        seq = alphabet.randomize_unknown_at(seq, seed)
    return ProteinDB(names=names, seq=seq,
                     starts=np.asarray(starts, dtype=np.int64))


def stream_fasta(path_or_file, *, chunk_aa: int = 1 << 24,
                 seed: int | None = 0, name_upto_space: bool = True,
                 drop_non_alpha: bool = True):
    """Yield ProteinDB chunks of >= ``chunk_aa`` residues (whole proteins).

    Bounded-memory FASTA reading for IGC-scale corpora (the reference
    loads the whole file; its IGC tools shard by splitting files).
    Chunks always break at protein boundaries, and unknown-residue
    replacement is position-keyed (``randomize_unknown_at`` with each
    chunk's global offset), so ``concat(stream_fasta(p))`` is
    element-identical to ``read_fasta(p)`` with the same seed.  A
    protein longer than ``chunk_aa`` becomes its own chunk.
    """
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    names: list[str] = []
    chunks: list[np.ndarray] = []
    starts = [0]
    cur: list[bytes] = []
    total = 0
    global_off = 0

    def _flush():
        nonlocal total
        if not names:
            cur.clear()      # text before the first '>' is not sequence
            return
        raw = b"".join(cur)
        if drop_non_alpha:
            raw = bytes(c for c in raw if (65 <= (c & ~32) <= 90))
        idx = alphabet.encode(raw)
        chunks.append(idx)
        total += len(idx)
        starts.append(total)
        cur.clear()

    def _emit():
        nonlocal names, chunks, starts, total, global_off
        seq = np.concatenate(chunks) if chunks else np.empty(0, np.uint8)
        if seed is not None:
            seq = alphabet.randomize_unknown_at(seq, seed, global_off)
        db = ProteinDB(names=names, seq=seq,
                       starts=np.asarray(starts, np.int64))
        global_off += len(seq)
        names, chunks, starts, total = [], [], [0], 0
        return db

    try:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                _flush()
                if total >= chunk_aa:
                    yield _emit()
                name = line[1:]
                if name_upto_space:
                    name = name.split(" ", 1)[0]
                names.append(name)
            else:
                cur.append(line.encode())
        _flush()
        if names:
            yield _emit()
    finally:
        if close:
            f.close()


def write_fasta(path_or_file, names, seqs) -> None:
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "w")
        close = True
    else:
        f = path_or_file
    try:
        for name, s in zip(names, seqs):
            if isinstance(s, np.ndarray):
                s = alphabet.decode(s)
            f.write(f">{name}\n{s}\n")
    finally:
        if close:
            f.close()


# ---------------------------------------------------------------------------
# data points format
# ---------------------------------------------------------------------------

_DP_HEADER = re.compile(r"^(?P<name>.*)#(?P<pid>\d+)\$(?P<off>\d+)@"
                        r"(?P<kmer>[A-Z]+)\*(?P<cnt>\d+)$")


def datapoint_header(name: str, protein_idx: int, offset: int,
                     kmer: str, count: int) -> str:
    """``name#proteinIdx$offset@kmer*count`` (protein2datapoints.cpp:64)."""
    return f"{name}#{protein_idx}${offset}@{kmer}*{count}"


def parse_datapoint_header(header: str):
    """Parse a datapoints header; returns dict or None if free-form."""
    m = _DP_HEADER.match(header)
    if not m:
        return None
    return {"name": m["name"], "protein_idx": int(m["pid"]),
            "offset": int(m["off"]), "kmer": m["kmer"],
            "count": int(m["cnt"])}


def read_datapoints(path_or_file, dim: int):
    """Read (names, points) from a data-points file.

    Mirrors motif_both_points.cpp:341-353: alternate header line / line of
    ``dim`` whitespace-separated floats.
    """
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    names: list[str] = []
    rows: list[np.ndarray] = []
    try:
        while True:
            header = f.readline()
            if not header:
                break
            header = header.rstrip("\n")
            if not header:
                continue
            values = f.readline()
            row = np.array(values.split(), dtype=np.float64)
            if row.shape[0] < dim:
                raise ValueError(
                    f"point line has {row.shape[0]} values, expected {dim}")
            names.append(header)
            rows.append(row[:dim])
    finally:
        if close:
            f.close()
    pts = np.stack(rows) if rows else np.empty((0, dim), np.float64)
    return names, pts


def write_datapoints(path_or_file, names, points, fmt: str = "%g") -> None:
    """Write alternating header/values lines (Point::Output,
    protein2datapoints.cpp:23-29)."""
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "w")
        close = True
    else:
        f = path_or_file
    try:
        for name, row in zip(names, points):
            f.write(name + "\n")
            f.write(" ".join(fmt % v for v in np.asarray(row)) + "\n")
    finally:
        if close:
            f.close()


# ---------------------------------------------------------------------------
# hit triples & cluster files
# ---------------------------------------------------------------------------

def write_triples(path_or_file, triples) -> None:
    """``center kmer distance`` lines (motif_both_points.cpp:239-242)."""
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "w")
        close = True
    else:
        f = path_or_file
    try:
        for center, kmer, dis in triples:
            f.write(f"{center} {kmer} {dis:g}\n")
    finally:
        if close:
            f.close()


def read_triples(path_or_file):
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    out = []
    try:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            out.append((parts[0], parts[1], float(parts[2])))
    finally:
        if close:
            f.close()
    return out


def write_clusters(path_or_file, clusters: list[list[str]],
                   style: str = "hclust2") -> None:
    """Cluster membership blocks.

    style='hclust2': ``#clusterid:<i>:size<n>`` headers (hclust2.cpp:142);
    style='hclust':  ``#cluster<i>`` headers (hclust.cpp:304).
    """
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "w")
        close = True
    else:
        f = path_or_file
    try:
        for i, members in enumerate(clusters):
            if style == "hclust2":
                f.write(f"#clusterid:{i}:size{len(members)}\n")
            else:
                f.write(f"#cluster{i}\n")
            for m in members:
                f.write(m + "\n")
    finally:
        if close:
            f.close()


def read_clusters(path_or_file) -> list[list[str]]:
    close = False
    if isinstance(path_or_file, (str, bytes)):
        f = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    clusters: list[list[str]] = []
    try:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("#cluster"):
                clusters.append([])
            elif clusters:
                clusters[-1].append(line)
    finally:
        if close:
            f.close()
    return clusters


def from_strings(text: str):
    """Convenience: wrap a string as a file-like for the readers above."""
    return _io.StringIO(text)
