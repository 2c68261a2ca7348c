"""Deterministic constants shared by the Spark plans AND their DuckDB
oracles (hash coefficients, hyperplanes). Generated from fixed seeds at
import time and embedded as literals on both sides, so the two engines run
byte-identical arithmetic."""

from __future__ import annotations

import random

# Mersenne prime 2^31 - 1: (a*x + b) % P stays < 2^62 for x < P, so the
# universal-hash arithmetic never overflows int64 in either engine.
MINHASH_P = 2_147_483_647
N_MINHASH = 16
N_BANDS = 8          # bands of 2 rows: P(candidate) = 1-(1-j^2)^8
SIMHASH_BITS = 32
N_PLANES = 16        # random-hyperplane LSH signature width
EMBED_DIM = 64


def minhash_coeffs(n: int = N_MINHASH, seed: int = 7) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, MINHASH_P), rnd.randrange(0, MINHASH_P))
            for _ in range(n)]


def lsh_planes(n_planes: int = N_PLANES, dim: int = EMBED_DIM,
               seed: int = 42) -> list[list[float]]:
    """Hyperplane weights rounded to 6dp so their decimal literals parse to
    identical doubles in PySpark and DuckDB SQL."""
    rnd = random.Random(seed)
    return [[round(rnd.uniform(-1.0, 1.0), 6) for _ in range(dim)]
            for _ in range(n_planes)]


MINHASH_COEFFS = minhash_coeffs()
LSH_PLANES = lsh_planes()
