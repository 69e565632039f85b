"""fimarith-style image arithmetic (reference core/ApImArith.py:255-346).

ADD/SUB/MUL/DIV of an image with a scalar or a second image.  The
reference preserves the input dtype on output (core/ApImArith.py:321);
we compute in float32 and let the host layer cast for file output.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp

ALLOWED_OPS = ("ADD", "SUB", "MUL", "DIV")


@functools.partial(jax.jit, static_argnames=("op",))
def imarith(
    img: jnp.ndarray,
    op: str,
    value: Union[float, jnp.ndarray],
) -> jnp.ndarray:
    op = op.upper()
    img = img.astype(jnp.float32)
    value = jnp.asarray(value, jnp.float32)
    if op == "ADD":
        return img + value
    if op == "SUB":
        return img - value
    if op == "MUL":
        return img * value
    if op == "DIV":
        return img / value
    raise ValueError(f"operation must be one of {ALLOWED_OPS}, got {op!r}")
