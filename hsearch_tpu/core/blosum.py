"""BLOSUM62 and the similarity -> metric-distance transform.

The core metric idea of HSEARCH: turn the BLOSUM62 similarity matrix B into
a distance d(i,j) = B(i,i) + B(j,j) - 2*B(i,j), which satisfies the triangle
inequality over the 20 amino acids and can therefore be embedded into
Euclidean space (reference: BLOSUM-Metric/src/BLOSUM-metric/
distance_matrix.hpp:13-51; the embedded D matrix is hard-coded in
IGC/distance2coordinate/BLOSUM.m:3-22).

Matrix rows/columns are in the canonical order ARNDCQEGHILKMFPSTWYV
(pcluster/src/pcluster/weight.hpp:22-45).
"""

from __future__ import annotations

import numpy as np

# BLOSUM62 (NCBI standard table; reference weight.hpp:22-45 and
# pcluster util.hpp:109-130).
BLOSUM62 = np.array([
    #A   R   N   D   C   Q   E   G   H   I   L   K   M   F   P   S   T   W   Y   V
    [ 4, -1, -2, -2,  0, -1, -1,  0, -2, -1, -1, -1, -1, -2, -1,  1,  0, -3, -2,  0],  # A
    [-1,  5,  0, -2, -3,  1,  0, -2,  0, -3, -2,  2, -1, -3, -2, -1, -1, -3, -2, -3],  # R
    [-2,  0,  6,  1, -3,  0,  0,  0,  1, -3, -3,  0, -2, -3, -2,  1,  0, -4, -2, -3],  # N
    [-2, -2,  1,  6, -3,  0,  2, -1, -1, -3, -4, -1, -3, -3, -1,  0, -1, -4, -3, -3],  # D
    [ 0, -3, -3, -3,  9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1],  # C
    [-1,  1,  0,  0, -3,  5,  2, -2,  0, -3, -2,  1,  0, -3, -1,  0, -1, -2, -1, -2],  # Q
    [-1,  0,  0,  2, -4,  2,  5, -2,  0, -3, -3,  1, -2, -3, -1,  0, -1, -3, -2, -2],  # E
    [ 0, -2,  0, -1, -3, -2, -2,  6, -2, -4, -4, -2, -3, -3, -2,  0, -2, -2, -3, -3],  # G
    [-2,  0,  1, -1, -3,  0,  0, -2,  8, -3, -3, -1, -2, -1, -2, -1, -2, -2,  2, -3],  # H
    [-1, -3, -3, -3, -1, -3, -3, -4, -3,  4,  2, -3,  1,  0, -3, -2, -1, -3, -1,  3],  # I
    [-1, -2, -3, -4, -1, -2, -3, -4, -3,  2,  4, -2,  2,  0, -3, -2, -1, -2, -1,  1],  # L
    [-1,  2,  0, -1, -3,  1,  1, -2, -1, -3, -2,  5, -1, -3, -1,  0, -1, -3, -2, -2],  # K
    [-1, -1, -2, -3, -1,  0, -2, -3, -2,  1,  2, -1,  5,  0, -2, -1, -1, -1, -1,  1],  # M
    [-2, -3, -3, -3, -2, -3, -3, -3, -1,  0,  0, -3,  0,  6, -4, -2, -2,  1,  3, -1],  # F
    [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4,  7, -1, -1, -4, -3, -2],  # P
    [ 1, -1,  1,  0, -1,  0,  0,  0, -1, -2, -2,  0, -1, -2, -1,  4,  1, -3, -2, -2],  # S
    [ 0, -1,  0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1,  1,  5, -2, -2,  0],  # T
    [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1,  1, -4, -3, -2, 11,  2, -3],  # W
    [-2, -2, -2, -3, -2, -1, -2, -3,  2, -1, -1, -2, -1,  3, -3, -2, -2,  2,  7, -1],  # Y
    [ 0, -3, -3, -3, -1, -2, -2, -3, -3,  3,  1, -2,  1, -1, -2, -2,  0, -3, -1,  4],  # V
], dtype=np.int32)

# 8-group reduced BLOSUM62 used by the pcluster pre-clustering
# (pcluster util.hpp:134-142); kept for parity of any consumer.
REDUCED_BLOSUM62 = np.array([
    [ 1.88889,  -0.8,      -1,       -0.666667, -0.666667, -1.08333, -2.22222, -1      ],
    [-0.8,       1.52,     -0.1,     -3.2,      -1.8,      -2.35,    -2.66667, -1.2    ],
    [-1,        -0.1,       4,       -3,        -1,        -2.75,    -1.66667, -2      ],
    [-0.666667, -3.2,      -3,        9,        -3,        -1,       -2,       -3      ],
    [-0.666667, -1.8,      -1,       -3,         6,        -3.5,     -2.66667, -2      ],
    [-1.08333,  -2.35,     -2.75,    -1,        -3.5,       2.3125,  -1.16667, -2.5    ],
    [-2.22222,  -2.66667,  -1.66667, -2,        -2.66667,  -1.16667,  4,       -3.66667],
    [-1,        -1.2,      -2,       -3,        -2,        -2.5,     -3.66667,  7      ],
], dtype=np.float64)


def similarity_to_distance(B: np.ndarray = BLOSUM62) -> np.ndarray:
    """d(i,j) = B(i,i) + B(j,j) - 2 B(i,j) (distance_matrix.hpp:18)."""
    diag = np.diag(B)
    return diag[:, None] + diag[None, :] - 2 * B


def triangle_inequality_violations(D: np.ndarray) -> int:
    """Count of (i,j,k) triples with D[i,j] + D[j,k] < D[i,k].

    Replicates the all-triples check of distance_matrix.hpp:36-50.
    """
    # D[i,j] + D[j,k] >= D[i,k] for all i,j,k  <=>  min_j (D[i,j]+D[j,k]) >= D[i,k]
    s = D[:, :, None] + D[None, :, :]       # s[i,j,k] = D[i,j] + D[j,k]
    return int((s < D[:, None, :]).sum())


#: The metric distance matrix used everywhere downstream
#: (equals BLOSUM.m:3-22's hard-coded D).
BLOSUM_DISTANCE = similarity_to_distance(BLOSUM62)


def score_kmers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Ungapped BLOSUM62 score of equal-length index k-mers (broadcast).

    a: (..., L), b: (..., L) -> (...,) summed substitution score.
    """
    return BLOSUM62[a, b].sum(axis=-1)
