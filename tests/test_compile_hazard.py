"""Compile-time hazard guard: closed-over arrays become HLO constants.

Round-2 finding (docs/NOTES_ROUND2.md "Compile-time hazard"): jitting a
function that CLOSES OVER a large array embeds it as an HLO constant, and
XLA's constant-folding pass then evaluates whole op chains over it on one
host thread at compile time — the multi-hundred-MB lookup pyramids folded
for >1 h (the `bench_stages.py` stage-E timeout). Passing the same arrays
as jit ARGUMENTS keeps them as parameters, which XLA never folds.

These tests pin the mechanism structurally (constant vs parameter in the
lowered HLO — deterministic, no compile-time timing) and guard the repo
invariant: *never close over cost-volume/pyramid-scale tensors; pass them
as arguments*. The model obeys it by construction (pyramids are carried
through `lax.scan`), and the bench scripts pass pyramids as arguments.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _pool_chain(p):
    # Stand-in for the lookup-pyramid pooling chain XLA tried to fold.
    for _ in range(3):
        p = 0.5 * (p[..., ::2] + p[..., 1::2])
    return p


def test_closed_over_array_is_embedded_as_hlo_constant():
    big = jnp.asarray(np.random.default_rng(0).standard_normal((64, 1024)),
                      jnp.float32)

    closed = jax.jit(lambda x: x[:1, :1] + _pool_chain(big).sum())
    text = closed.lower(jnp.zeros((1, 1), jnp.float32)).as_text()
    # The closed-over array appears as a materialized 64x1024 dense constant
    # in the module — exactly what XLA's folding pass then chews on.
    assert re.search(r"stablehlo\.constant dense<\"0x[0-9A-F]+\"> "
                     r": tensor<64x1024xf32>", text)

    as_arg = jax.jit(lambda x, p: x[:1, :1] + _pool_chain(p).sum())
    text2 = as_arg.lower(jnp.zeros((1, 1), jnp.float32), big).as_text()
    # As an argument it is a parameter — never constant-folded.
    assert re.search(r"%arg1: tensor<64x1024xf32>", text2)
    assert "stablehlo.constant dense<\"0x" not in text2


@pytest.mark.parametrize("script", ["bench_stages", "bench_refine",
                                    "benchmark_kernels"])
def test_bench_scripts_document_the_invariant(script):
    """The perf scripts that touch pyramid-scale tensors must carry the
    pass-as-arguments invariant in-source (they are the places the hazard
    actually fired)."""
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent / "scripts" /
           f"{script}.py").read_text()
    assert "closed" in src and "argument" in src.lower()
