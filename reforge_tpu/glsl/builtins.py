"""GLSL builtin functions for the vectorizing interpreter.

Componentwise math maps directly onto jnp (VPU ops after fusion); geometric
functions reduce over components.  ``clamp``/``min``/``max`` additionally
propagate pixel-coordinate origins: ``clamp(pos + ivec2(i, j), ivec2(0),
size - 1)`` keeps its origin with the ``clamped`` flag set, letting
imageLoad emit an edge-padded shift instead of a gather (interp._shift).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

from .interp import Interp, Origin, Val, is_static
from .lexer import GlslError


def _static_all(*xs) -> bool:
    return all(is_static(x) for x in xs)


def _map1(interp: Interp, v: Val, py: Callable, jx: Callable, out_elem: str | None = None) -> Val:
    """Componentwise unary map."""
    elem = out_elem or ("float" if v.elem_type in ("float",) else v.elem_type)
    if v.is_vector():
        data = [py(c) if is_static(c) else jx(c) for c in v.data]
        prefix = {"float": "", "int": "i", "uint": "u", "bool": "b"}[elem]
        return Val(f"{prefix}vec{v.size}" if v.size > 1 else elem, data)
    return Val(elem, py(v.data) if is_static(v.data) else jx(v.data))


def _broadcast_args(interp: Interp, args: list[Val], line: int) -> tuple[list[Val], str]:
    """Broadcast scalars to the common vector size; floats win over ints."""
    size = max(a.size for a in args)
    any_float = any(a.elem_type == "float" for a in args)
    elem = "float" if any_float else args[0].elem_type
    out = []
    for a in args:
        if a.is_vector():
            if a.size != size:
                raise GlslError("vector size mismatch in builtin call", line)
            out.append(interp.convert(a, _vec_name(elem, size), line) if a.elem_type != elem else a)
        else:
            conv = interp.convert(a, elem, line)
            if size > 1:
                out.append(Val(_vec_name(elem, size), [conv.data] * size))
            else:
                out.append(conv)
    return out, elem


def _vec_name(elem: str, size: int) -> str:
    if size == 1:
        return elem
    prefix = {"float": "", "int": "i", "uint": "u", "bool": "b"}[elem]
    return f"{prefix}vec{size}"


def _zip_map(
    interp: Interp, args: list[Val], line: int, py: Callable, jx: Callable,
    out_elem: Optional[str] = None,
) -> Val:
    args, elem = _broadcast_args(interp, args, line)
    elem = out_elem or elem
    size = args[0].size
    if size == 1:
        xs = [a.data for a in args]
        return Val(elem, py(*xs) if _static_all(*xs) else jx(*xs))
    comps = []
    for i in range(size):
        xs = [a.data[i] for a in args]
        comps.append(py(*xs) if _static_all(*xs) else jx(*xs))
    return Val(_vec_name(elem, size), comps)


# ---- origin-aware min/max/clamp ----------------------------------------


def _origin_of(v: Val, comp: int) -> Optional[Origin]:
    if v.is_vector():
        origins = getattr(v, "_comp_origins", None)
        return origins[comp] if origins else None
    return v.origin


def _clamp_origin(
    interp: Interp, x: Val, lo: Val, hi: Val, comp: int, axis_extent: dict
) -> Optional[Origin]:
    """Origin of clamp(x, lo, hi) when lo==0 and hi==extent-1 for x's axis."""
    ox = _origin_of(x, comp)
    if ox is None or ox.clamped:
        return ox
    lo_d = lo.data[comp] if lo.is_vector() else lo.data
    hi_d = hi.data[comp] if hi.is_vector() else hi.data
    if not (is_static(lo_d) and is_static(hi_d)):
        return None
    extent = axis_extent[ox.axis]
    if int(lo_d) == 0 and int(hi_d) == extent - 1:
        return Origin(ox.axis, ox.offset, clamped=True)
    return None


def _bi_clamp(interp: Interp, args: list[Val], line: int) -> Val:
    x, lo, hi = args
    out = _zip_map(
        interp, args, line,
        py=lambda a, b, c: min(max(a, b), c),
        jx=lambda a, b, c: jnp.clip(a, b, c),
    )
    # Propagate pixel origins through exact image-bounds clamps.
    if x.elem_type in ("int", "uint"):
        extents = {"x": interp.w, "y": interp.global_h}
        if out.is_vector():
            origins = [
                _clamp_origin(interp, x, lo, hi, i, extents)
                for i in range(out.size)
            ]
            out._comp_origins = origins  # type: ignore[attr-defined]
        else:
            out.origin = _clamp_origin(interp, x, lo, hi, 0, extents)
    return out


# ---- geometric ----------------------------------------------------------


def _dot(interp: Interp, args: list[Val], line: int) -> Val:
    a, b = args
    if not a.is_vector() or not b.is_vector() or a.size != b.size:
        raise GlslError("dot() needs equal-size vectors", line)
    total = None
    for x, y in zip(a.data, b.data):
        term = x * y
        total = term if total is None else total + term
    return Val("float", total)


def _length(interp: Interp, args: list[Val], line: int) -> Val:
    (a,) = args
    if not a.is_vector():
        return _zip_map(interp, [a], line, abs, jnp.abs)
    d = _dot(interp, [a, a], line)
    return Val("float", math.sqrt(d.data) if is_static(d.data) else jnp.sqrt(d.data))


def _screen_derivative(interp: Interp, v: Val, axis: int) -> Val:
    """Forward difference along screen x (axis=1, lanes) or y (axis=0,
    sublanes), edge-clamped — the whole-image analog of the GPU's 2x2-quad
    dFdx/dFdy (which are likewise neighbor differences, just quad-aligned).
    Derivatives of uniforms are exactly zero."""

    # The row direction is the sharded axis: register a 1-row halo so
    # spatial sharding exchanges the boundary row (lane-direction
    # differences never cross shards).
    interp.stats["max_shift"] = max(interp.stats.get("max_shift", 0), 1)
    interp.stats["edge_shift"] = True

    def d(comp):
        if is_static(comp):
            return 0.0
        a = interp._as_array(comp, "float")
        if axis == 1:
            nxt = jnp.pad(a[:, 1:], ((0, 0), (0, 1)), mode="edge")
        else:
            nxt = jnp.pad(a[1:, :], ((0, 1), (0, 0)), mode="edge")
        return nxt - a

    if v.is_vector():
        return Val(f"vec{v.size}", [d(c) for c in v.data])
    return Val("float", d(v.data))


def _dfdx(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    return _screen_derivative(interp, v, 1)


def _dfdy(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    return _screen_derivative(interp, v, 0)


def _fwidth(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    ax = _map1(interp, _dfdx(interp, [v], line), abs, jnp.abs)
    ay = _map1(interp, _dfdy(interp, [v], line), abs, jnp.abs)
    return interp._arith("+", ax, ay, line)


def _distance(interp: Interp, args: list[Val], line: int) -> Val:
    a, b = args
    diff = interp._arith("-", a, b, line)
    return _length(interp, [diff], line)


def _normalize(interp: Interp, args: list[Val], line: int) -> Val:
    (a,) = args
    ln = _length(interp, [a], line)
    return interp._arith("/", a, ln, line)


def _cross(interp: Interp, args: list[Val], line: int) -> Val:
    a, b = args
    if a.type != "vec3" or b.type != "vec3":
        raise GlslError("cross() needs vec3", line)
    ax, ay, az = a.data
    bx, by, bz = b.data
    return Val("vec3", [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx])


def _reflect(interp: Interp, args: list[Val], line: int) -> Val:
    i, n = args
    d = _dot(interp, [n, i], line)
    two_d = Val("float", 2.0 * d.data)
    scaled = interp._arith("*", n, two_d, line)
    return interp._arith("-", i, scaled, line)


def _mix(interp: Interp, args: list[Val], line: int) -> Val:
    return _zip_map(
        interp, args, line,
        py=lambda x, y, a: x + (y - x) * a,
        jx=lambda x, y, a: x + (y - x) * a,
    )


def _mod(interp: Interp, args: list[Val], line: int) -> Val:
    # GLSL float mod: x - y*floor(x/y)
    return _zip_map(
        interp, args, line,
        py=lambda x, y: x - y * math.floor(x / y) if y != 0 else 0.0,
        jx=lambda x, y: x - y * jnp.floor(x / y),
    )


def _step(interp: Interp, args: list[Val], line: int) -> Val:
    return _zip_map(
        interp, args, line,
        py=lambda e, x: 0.0 if x < e else 1.0,
        jx=lambda e, x: jnp.where(x < e, 0.0, 1.0),
    )


def _smoothstep(interp: Interp, args: list[Val], line: int) -> Val:
    def py(e0, e1, x):
        t = min(max((x - e0) / (e1 - e0), 0.0), 1.0)
        return t * t * (3.0 - 2.0 * t)

    def jx(e0, e1, x):
        t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    return _zip_map(interp, args, line, py, jx)


def _atan(interp: Interp, args: list[Val], line: int) -> Val:
    if len(args) == 2:
        return _zip_map(interp, args, line, math.atan2, jnp.arctan2)
    return _zip_map(interp, args, line, math.atan, jnp.arctan)


def _compare_vec(op_py, op_jx):
    def fn(interp: Interp, args: list[Val], line: int) -> Val:
        return _zip_map(interp, args, line, op_py, op_jx, out_elem="bool")

    return fn


def _any(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    acc = None
    for c in v.data if v.is_vector() else [v.data]:
        acc = c if acc is None else (
            (acc or c) if _static_all(acc, c) else jnp.logical_or(acc, c)
        )
    return Val("bool", acc)


def _all(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    acc = None
    for c in v.data if v.is_vector() else [v.data]:
        acc = c if acc is None else (
            (acc and c) if _static_all(acc, c) else jnp.logical_and(acc, c)
        )
    return Val("bool", acc)


def _not(interp: Interp, args: list[Val], line: int) -> Val:
    (v,) = args
    return _map1(interp, v, lambda x: not x, jnp.logical_not, out_elem="bool")


def _simple(py: Callable, jx: Callable, out_elem: Optional[str] = None):
    def fn(interp: Interp, args: list[Val], line: int) -> Val:
        return _zip_map(interp, args, line, py, jx, out_elem=out_elem)

    return fn


def _trunc_py(x):
    return float(int(x))


BUILTIN_FUNCS: dict[str, Callable[[Interp, list, int], Val]] = {
    "abs": _simple(abs, jnp.abs, None),
    "sign": _simple(lambda x: (x > 0) - (x < 0), jnp.sign),
    "floor": _simple(math.floor, jnp.floor),
    "ceil": _simple(math.ceil, jnp.ceil),
    "fract": _simple(lambda x: x - math.floor(x), lambda x: x - jnp.floor(x)),
    "trunc": _simple(_trunc_py, jnp.trunc),
    "round": _simple(round, jnp.round),
    "roundEven": _simple(round, jnp.round),
    "min": _simple(min, jnp.minimum),
    "max": _simple(max, jnp.maximum),
    "clamp": _bi_clamp,
    "mix": _mix,
    "step": _step,
    "smoothstep": _smoothstep,
    "mod": _mod,
    "pow": _simple(math.pow, jnp.power),
    "exp": _simple(math.exp, jnp.exp),
    "exp2": _simple(lambda x: 2.0 ** x, jnp.exp2),
    "log": _simple(math.log, jnp.log),
    "log2": _simple(math.log2, jnp.log2),
    "sqrt": _simple(math.sqrt, jnp.sqrt),
    "inversesqrt": _simple(lambda x: 1.0 / math.sqrt(x), lambda x: 1.0 / jnp.sqrt(x)),
    "sin": _simple(math.sin, jnp.sin),
    "cos": _simple(math.cos, jnp.cos),
    "tan": _simple(math.tan, jnp.tan),
    "asin": _simple(math.asin, jnp.arcsin),
    "acos": _simple(math.acos, jnp.arccos),
    "atan": _atan,
    "sinh": _simple(math.sinh, jnp.sinh),
    "cosh": _simple(math.cosh, jnp.cosh),
    "tanh": _simple(math.tanh, jnp.tanh),
    "radians": _simple(math.radians, jnp.radians),
    "degrees": _simple(math.degrees, jnp.degrees),
    "dot": _dot,
    "length": _length,
    "dFdx": _dfdx,
    "dFdy": _dfdy,
    "fwidth": _fwidth,
    "distance": _distance,
    "normalize": _normalize,
    "cross": _cross,
    "reflect": _reflect,
    "lessThan": _compare_vec(lambda a, b: a < b, jnp.less),
    "lessThanEqual": _compare_vec(lambda a, b: a <= b, jnp.less_equal),
    "greaterThan": _compare_vec(lambda a, b: a > b, jnp.greater),
    "greaterThanEqual": _compare_vec(lambda a, b: a >= b, jnp.greater_equal),
    "equal": _compare_vec(lambda a, b: a == b, jnp.equal),
    "notEqual": _compare_vec(lambda a, b: a != b, jnp.not_equal),
    "any": _any,
    "all": _all,
    "not": _not,
    "isnan": _simple(lambda x: x != x, jnp.isnan, out_elem="bool"),
    "isinf": _simple(lambda x: x in (float("inf"), float("-inf")), jnp.isinf, out_elem="bool"),
}
