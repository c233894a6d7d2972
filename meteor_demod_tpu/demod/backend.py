"""Recurrence-backend selection: Pallas kernel on TPU, XLA scan elsewhere.

Both backends share the contract
  demod(carry, x) -> (carry', BlockOutput)
with a leading (batch,) axis on every carry leaf and x of shape
(batch, block_len, 2) float32. `make_batch_demod` picks the fastest
available implementation; callers can force one with `backend=`.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from ..config import DemodConfig
from .scan import make_block_demod


def default_backend() -> str:
    return "pallas" if jax.devices()[0].platform == "tpu" else "scan"


@functools.lru_cache(maxsize=32)
def make_batch_demod(cfg: DemodConfig, batch: int,
                     backend: str = "auto",
                     locked: bool = False) -> Callable:
    """Batched block demodulator; backend in {'auto', 'scan', 'pallas'}.

    locked=True builds the Pallas kernel's LOCKED-mode geometry (narrow
    candidate window + verified offset gate — kernels/block_demod.py):
    decision-identical to the wide program inside the locked envelope
    (float values agree to cross-program FMA-fusion tolerance, a few
    ULP), flags into the oracle fallback outside it. Hosts switch to it when every
    stream is carrier-locked. A no-op for the scan backend (it has no
    window geometry to narrow), so callers can request it unconditionally.
    """
    if backend == "auto":
        backend = default_backend()
    if backend == "pallas":
        from ..kernels.block_demod import make_pallas_batch_demod
        return make_pallas_batch_demod(cfg, batch, locked=locked)
    if backend == "scan":
        return jax.vmap(make_block_demod(cfg))
    raise ValueError(f"unknown backend {backend!r}")


@functools.lru_cache(maxsize=32)
def jit_batch_demod(cfg: DemodConfig, batch: int,
                    backend: str = "auto", locked: bool = False) -> Callable:
    if backend == "auto":
        backend = default_backend()
    if backend == "scan":
        locked = False                 # scan has no locked geometry
    return jax.jit(make_batch_demod(cfg, batch, backend, locked))


def make_single_demod(cfg: DemodConfig, backend: str = "auto",
                      locked: bool = False) -> Callable:
    """Single-stream (no batch axis) block demodulator, unjitted."""
    if backend == "auto":
        backend = default_backend()
    if backend == "scan":
        return make_block_demod(cfg)
    batched = make_batch_demod(cfg, 1, backend, locked)

    def single(carry, x):
        carry1 = jax.tree_util.tree_map(lambda a: a[None], carry)
        carry2, outs = batched(carry1, x[None])
        return (jax.tree_util.tree_map(lambda a: a[0], carry2),
                jax.tree_util.tree_map(lambda a: a[0], outs))

    return single


@functools.lru_cache(maxsize=32)
def jit_single_demod(cfg: DemodConfig, backend: str = "auto",
                     locked: bool = False) -> Callable:
    """Single-stream (no batch axis) jitted block demodulator."""
    if backend == "auto":
        backend = default_backend()
    if backend == "scan":
        locked = False                 # scan has no locked geometry
    return jax.jit(make_single_demod(cfg, backend, locked))
