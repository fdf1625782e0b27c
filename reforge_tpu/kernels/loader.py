"""Kernel source loading: .py kernel modules and .comp GLSL shaders.

This is the analog of the reference's ``Shader::from_path`` (runtime GLSL
compile + SPIR-V reflection, src/vulkan/shader.rs:29-59).  Kernel files are
(re)loaded from disk on every graph build and on live reload; any error
warns and returns None so the engine keeps the last-good program
(src/render.rs:121-136 semantics).

Two source kinds:
  * ``.py`` — executed as a module; the file defines kernels with the
    ``@kernel`` decorator (or bare ``KernelSpec`` values).  The spec whose
    name matches the file stem wins; otherwise the first spec found.
  * ``.comp`` — a GLSL compute shader, translated to a JAX kernel by the
    GLSL-subset compiler (glsl/), with bindings reflected from its
    ``layout`` declarations.
"""

from __future__ import annotations

import os
import traceback
from typing import Optional

from .base import KernelSpec, lookup_builtin
from ..utils import warnln


# Loaded specs keyed by path, valid while the source text is unchanged.
# Returning the SAME spec object for unchanged sources is what lets the
# per-node jit cache (graph/program.py) reuse compiled executables across
# rebuilds — the enabler of sub-frame live reload: a one-kernel edit
# recompiles one node, every other node is already compiled.
_spec_cache: dict[str, tuple[str, KernelSpec]] = {}


def load_kernel_file(path: str) -> Optional[KernelSpec]:
    ext = os.path.splitext(path)[1]
    try:
        with open(path, "r") as f:
            source = f.read()
    except OSError as e:
        warnln(f"Unable to read kernel file {path}: {e}")
        return None

    cached = _spec_cache.get(path)
    if cached is not None and cached[0] == source:
        return cached[1]

    if ext == ".py":
        spec = _load_py_kernel(path, source)
    elif ext in (".comp", ".frag", ".glsl"):
        spec = _load_glsl_kernel(path, source)
    else:
        warnln(f"Unknown kernel source extension '{ext}' for {path}")
        return None
    if spec is not None:
        _spec_cache[path] = (source, spec)
    return spec


def _load_py_kernel(path: str, source: str) -> Optional[KernelSpec]:
    stem = os.path.splitext(os.path.basename(path))[0]
    namespace: dict = {"__file__": path, "__name__": f"rf_kernel_{stem}"}
    try:
        code = compile(source, path, "exec")
        exec(code, namespace)
    except Exception:
        warnln(f"Error loading kernel module {path}:\n{traceback.format_exc()}")
        return None

    specs = [v for v in namespace.values() if isinstance(v, KernelSpec)]
    if not specs:
        warnln(f"Kernel module {path} defines no KernelSpec (use @kernel)")
        return None
    spec = next((s for s in specs if s.name == stem), specs[0])
    spec.source_path = path
    return spec


def _load_glsl_kernel(path: str, source: str) -> Optional[KernelSpec]:
    from ..glsl import translate_shader  # lazy: the translator is heavyweight

    stem = os.path.splitext(os.path.basename(path))[0]
    try:
        spec = translate_shader(source, name=stem, path=path)
    except Exception as e:
        warnln(f"Error compiling GLSL kernel {path}:\n{e}")
        return None
    spec.source_path = path
    return spec


def resolve_kernel(pipeline_type: str, file_path: str) -> Optional[KernelSpec]:
    """Resolve a node's kernel: source file if present, else builtin registry.

    Mirrors the reference's shader lookup, where a missing shader file is a
    warn-and-keep-last-good condition (src/vulkan/vkutils.rs:140-150), with
    the extra builtin-registry fallback (the reference has no builtin
    library beyond passthrough.comp).
    """
    if file_path:
        return load_kernel_file(file_path)
    spec = lookup_builtin(pipeline_type)
    if spec is None:
        warnln(
            f"No kernel source found for pipeline type '{pipeline_type}' "
            f"(no .comp/.py file in the shader path, not a builtin kernel)"
        )
    return spec
