"""Device dtype helpers: order codes, sentinels, masked values.

Shared by the sort / join / aggregate kernels.  All operate on jnp arrays inside
jit traces.
"""

from __future__ import annotations

import numpy as np

from ..utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402

INT64_MIN = np.int64(np.iinfo(np.int64).min)
INT64_MAX = np.int64(np.iinfo(np.int64).max)


def order_code(data, np_kind: str):
    """Map a column to int64 codes whose ascending order == SQL ordering.

    Floats use the sign-flip bit trick (monotone float64 -> int64); ints/bools
    pass through.  Codes are clipped by 2 so descending negation and null
    sentinels cannot overflow (same contract as the CPU oracle)."""
    if np_kind == "f":
        bits = jax.lax.bitcast_convert_type(data.astype(jnp.float64), jnp.int64)
        codes = jnp.where(bits >= 0, bits, jnp.bitwise_xor(~bits, INT64_MIN))
    elif np_kind == "b":
        codes = data.astype(jnp.int64)
    else:
        codes = data.astype(jnp.int64)
    return jnp.clip(codes, INT64_MIN + 2, INT64_MAX - 2)


def key_code(data, validity, np_kind: str):
    """Exact join/group key encoding: (code, null_flag).

    Unlike ``order_code`` this must be collision-free, so no clipping: floats
    are bit-cast (with -0.0 normalized to 0.0 and NaN nulled), ints pass
    through.  Nullness is carried as a separate flag array so INT64_MIN stays a
    legal key value (the reference sentinel-encodes and loses this,
    ``record_batch_convert.rs:102-110``)."""
    if np_kind == "f":
        f = data.astype(jnp.float64)
        f = jnp.where(f == 0.0, 0.0, f)  # -0.0 == 0.0 in SQL
        isnan = jnp.isnan(f)
        codes = jax.lax.bitcast_convert_type(jnp.where(isnan, 0.0, f), jnp.int64)
        nulls = isnan if validity is None else (isnan | ~validity)
    else:
        codes = data.astype(jnp.int64)
        nulls = None if validity is None else ~validity
    if nulls is None:
        nulls = jnp.zeros(data.shape, dtype=jnp.bool_)
    return codes, nulls


def masked_fill(data, mask, fill):
    """Replace entries where mask is False with ``fill``."""
    return jnp.where(mask, data, jnp.asarray(fill, dtype=data.dtype))
