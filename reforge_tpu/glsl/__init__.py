"""GLSL-subset -> JAX compiler.

The TPU-era replacement for the reference's shaderc + spirv-reflect path
(reference: src/vulkan/shader.rs): GLSL compute shaders parse to an AST,
``layout`` declarations are reflected into kernel bindings (images, UBO
parameter blocks), and the shader body is vectorized by the interpreter in
interp.py — tracing it under jax.jit yields the compiled XLA program.

``translate_shader(source, name, path)`` is the loader hook used for
``.comp`` files (kernels/loader.py), producing an ordinary KernelSpec that
participates in graph fusion, live reload, and sharding like builtin
kernels.  Halo metadata for spatial sharding is reflected by abstract
interpretation: a dry eval_shape run records the maximum static image-load
shift and whether any data-dependent gather occurred.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from . import ast
from .lexer import GlslError
from .parser import parse_shader_source
from .interp import Interp
from ..kernels.base import KernelContext, KernelSpec, ParamDecl, ParamKind

__all__ = ["translate_shader", "GlslError", "reflect_bindings"]


def _walk_image_usage(shader: ast.Shader) -> tuple[set, set]:
    """Which images are imageLoad'ed / imageStore'd anywhere in the shader."""
    loaded: set[str] = set()
    stored: set[str] = set()

    def walk(node: Any) -> None:
        if not hasattr(node, "__dataclass_fields__"):
            return
        if isinstance(node, ast.Call) and node.args and isinstance(node.args[0], ast.Ident):
            if node.name == "imageLoad":
                loaded.add(node.args[0].name)
            elif node.name == "imageStore":
                stored.add(node.args[0].name)
        for field in node.__dataclass_fields__:
            v = getattr(node, field)
            if isinstance(v, list):
                for item in v:
                    walk(item)
            else:
                walk(v)

    for fn in shader.functions.values():
        for stmt in fn.body:
            walk(stmt)
    return loaded, stored


def reflect_bindings(shader: ast.Shader) -> dict:
    """Binding reflection: images (with direction) and UBO parameters.

    Direction comes from usage analysis (imageLoad/imageStore call sites),
    falling back to readonly/writeonly qualifiers for unused declarations —
    more robust than qualifiers alone, and equivalent to what the reference
    gets from SPIR-V reflection (shader.rs:106-160).
    """
    loaded, stored = _walk_image_usage(shader)
    images_in: list[str] = []
    images_out: list[str] = []
    for img in sorted(shader.images, key=lambda d: d.binding):
        is_in = img.name in loaded or (
            img.name not in stored and not img.writeonly
        )
        is_out = img.name in stored or (
            img.name not in loaded and img.writeonly
        )
        if is_in:
            images_in.append(img.name)
        if is_out:
            images_out.append(img.name)
    params: dict[str, ParamDecl] = {}
    for ubo in shader.ubos:
        for m in ubo.members:
            if m.name == "_rf_time" or m.name.endswith("_rf_time"):
                continue
            kind = {
                "float": ParamKind.FLOAT,
                "int": ParamKind.INT,
                "uint": ParamKind.INT,
                "bool": ParamKind.BOOL,
            }.get(m.type)
            if kind is None:
                raise GlslError(
                    f"UBO member '{m.name}': only scalar float/int/bool "
                    f"parameters are supported (got {m.type})"
                )
            # Unspecified parameters default to zero, matching the
            # reference's zero-fill of unset UBO members (render.rs:187-193).
            default = {ParamKind.FLOAT: 0.0, ParamKind.INT: 0, ParamKind.BOOL: False}[kind]
            params[m.name] = ParamDecl(m.name, kind, default)
    return {"images_in": images_in, "images_out": images_out, "params": params}


def translate_shader(source: str, name: str, path: Optional[str] = None) -> KernelSpec:
    shader = parse_shader_source(source)
    bindings = reflect_bindings(shader)
    if not bindings["images_out"]:
        raise GlslError(f"shader '{name}' never stores to any image")

    def run(ctx: KernelContext, **kwargs: Any) -> dict[str, Any]:
        images = {k: v for k, v in kwargs.items() if k in bindings["images_in"]}
        params = {k: v for k, v in kwargs.items() if k not in images}
        interp = Interp(
            shader,
            height=ctx.block_height,
            width=ctx.width,
            images_in=images,
            params=params,
            time=ctx.time,
            row_offset=ctx.row_offset,
            global_height=ctx.height,
        )
        outputs = interp.run_main()
        # Every declared output gets a value; unwritten ones pass through
        # zeros (matching an unwritten storage image).
        for out_name in bindings["images_out"]:
            if out_name not in outputs:
                outputs[out_name] = jnp.zeros((4, ctx.height, ctx.width), jnp.float32)
        return outputs

    @functools.lru_cache(maxsize=64)
    def halo_of(params_key: tuple) -> Optional[int]:
        params = dict(params_key)
        stats = {"max_shift": 0, "gather": False}

        def dry(time):
            imgs = {
                n: jnp.zeros((4, 64, 64), jnp.float32)
                for n in bindings["images_in"]
            }
            interp = Interp(shader, 64, 64, imgs, params, time=time, stats=stats)
            interp.run_main()
            return 0

        try:
            jax.eval_shape(dry, jax.ShapeDtypeStruct((), jnp.float32))
        except Exception:
            return None  # conservatively unshardable if the dry run fails
        if stats["gather"]:
            return None
        return stats["max_shift"]

    spec = KernelSpec(
        name=name,
        fn=run,
        images_in=tuple(bindings["images_in"]),
        images_out=tuple(bindings["images_out"]),
        params=bindings["params"],
        halo=lambda params: halo_of(tuple(sorted(params.items()))),
        source_path=path,
        doc=f"GLSL kernel translated from {path or name}",
    )
    return spec
