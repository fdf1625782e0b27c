"""Sequential per-pixel reference interpreter for the GLSL subset.

An INDEPENDENT oracle for the vectorizing interpreter
(reforge_tpu/glsl/interp.py): the same parser's AST executed with plain
Python floats, one pixel at a time, in textbook sequential GLSL
semantics — no lane masks, no carries, no tracing.  Control flow is
Python control flow; image stores mutate a float64 numpy array in
program order.  Where the vectorized engine needs 3k lines of masking
machinery, sequential semantics need ~400 — which is exactly what makes
this a trustworthy differential baseline (tests/test_scalar_ref.py).

Scope: the compute-stage subset the shipped shaders use.  Unsupported
constructs raise ``RefUnsupported`` so tests can select shaders
deliberately rather than silently skipping semantics.

Cross-pixel write ordering: GLSL leaves invocation order undefined, but
a differential test needs ONE schedule on both sides.  The vectorized
engine executes statement-by-statement in lockstep across all pixels
(all lanes run statement k before any lane runs statement k+1, loop
round r before round r+1).  The reference reproduces that schedule
without vectorizing: every ``imageStore`` is journaled with a "program
clock" (the path of statement indices / loop rounds / branch arms
leading to it), and the journal is replayed in clock order after all
pixels ran.  Reads therefore always see the ORIGINAL image contents;
shaders that load from an image they also store to are rejected
(``RefUnsupported``) rather than silently diverging.
"""

from __future__ import annotations

import math

import numpy as np

from reforge_tpu.glsl import ast
from reforge_tpu.glsl.parser import parse_shader_source

VEC = {
    "vec2": ("float", 2), "vec3": ("float", 3), "vec4": ("float", 4),
    "ivec2": ("int", 2), "ivec3": ("int", 3), "ivec4": ("int", 4),
    "uvec2": ("uint", 2), "uvec3": ("uint", 3), "uvec4": ("uint", 4),
    "bvec2": ("bool", 2), "bvec3": ("bool", 3), "bvec4": ("bool", 4),
}
MAT = {"mat2": 2, "mat3": 3, "mat4": 4}
SWZ = {c: i for i, c in enumerate("xyzw")}
SWZ.update({c: i for i, c in enumerate("rgba")})
SWZ.update({c: i for i, c in enumerate("stpq")})


class RefUnsupported(Exception):
    pass


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, v):
        self.v = v


def _lift1(f):
    def g(a):
        if isinstance(a, list):
            return [f(x) for x in a]
        return f(a)
    return g


def _lift2(f):
    def g(a, b):
        if isinstance(a, list) and isinstance(b, list):
            return [f(x, y) for x, y in zip(a, b)]
        if isinstance(a, list):
            return [f(x, b) for x in a]
        if isinstance(b, list):
            return [f(a, y) for y in b]
        return f(a, b)
    return g


def _lift3(f):
    def g(a, b, c):
        n = next((len(v) for v in (a, b, c) if isinstance(v, list)), None)
        if n is None:
            return f(a, b, c)
        def at(v, i):
            return v[i] if isinstance(v, list) else v
        return [f(at(a, i), at(b, i), at(c, i)) for i in range(n)]
    return g


def _smoothstep(e0, e1, x):
    if e1 == e0:
        return 0.0 if x < e0 else 1.0
    t = min(max((x - e0) / (e1 - e0), 0.0), 1.0)
    return t * t * (3.0 - 2.0 * t)


def _mod(a, b):
    return a - b * math.floor(a / b) if b != 0 else 0.0


def _lift4(f):
    def g(a, b, c, d):
        n = next((len(v) for v in (a, b, c, d) if isinstance(v, list)), None)
        if n is None:
            return f(a, b, c, d)

        def at(v, i):
            return v[i] if isinstance(v, list) else v

        return [f(at(a, i), at(b, i), at(c, i), at(d, i)) for i in range(n)]
    return g


# Bit-level builtins use the uint (non-negative) interpretation of the
# 32-bit result — the scalar values carry no int/uint tag, so signed
# variants (bitfieldExtract sign extension, negative bitfieldReverse
# results) are covered by the hand-written engine tests instead;
# differential shaders should apply them to uints.

def _ref_find_lsb(x):
    v = int(x) & 0xFFFFFFFF
    return (v & -v).bit_length() - 1 if v else -1


def _ref_find_msb(x):
    v = int(x)
    if v < 0:
        v = ~v
    v &= 0xFFFFFFFF
    return v.bit_length() - 1


def _ref_bfi(base, ins, o, b):
    base, ins, o, b = (int(base) & 0xFFFFFFFF, int(ins) & 0xFFFFFFFF,
                       int(o), int(b))
    mask = ((1 << b) - 1) << o
    return ((base & ~mask) | ((ins << o) & mask)) & 0xFFFFFFFF


_BUILTINS = {
    "sin": _lift1(math.sin), "cos": _lift1(math.cos),
    "tan": _lift1(math.tan), "asin": _lift1(lambda x: math.asin(max(-1.0, min(1.0, x)))),
    "acos": _lift1(lambda x: math.acos(max(-1.0, min(1.0, x)))),
    "exp": _lift1(math.exp), "exp2": _lift1(lambda x: 2.0 ** x),
    "log": _lift1(lambda x: math.log(x) if x > 0 else -math.inf),
    "log2": _lift1(lambda x: math.log2(x) if x > 0 else -math.inf),
    "sqrt": _lift1(lambda x: math.sqrt(max(x, 0.0))),
    "inversesqrt": _lift1(lambda x: 1.0 / math.sqrt(x) if x > 0 else math.inf),
    "abs": _lift1(abs),
    "sign": _lift1(lambda x: (x > 0) - (x < 0) if isinstance(x, int) else float((x > 0) - (x < 0))),
    "floor": _lift1(math.floor), "ceil": _lift1(math.ceil),
    "fract": _lift1(lambda x: x - math.floor(x)),
    "round": _lift1(lambda x: float(np.round(x))),
    "pow": _lift2(lambda x, y: math.pow(x, y) if x >= 0 else math.nan),
    "min": _lift2(min), "max": _lift2(max),
    "mod": _lift2(_mod),
    "step": _lift2(lambda e, x: 0.0 if x < e else 1.0),
    "atan": None,  # special-cased (1/2 args)
    "clamp": _lift3(lambda x, lo, hi: min(max(x, lo), hi)),
    "mix": _lift3(lambda a, b, t: (b if t else a) if isinstance(t, bool)
                  else a * (1.0 - t) + b * t),
    "smoothstep": _lift3(_smoothstep),
    "trunc": _lift1(lambda x: float(int(x))),
    "roundEven": _lift1(lambda x: float(np.round(x))),
    "fma": _lift3(lambda a, b, c: a * b + c),
    "ldexp": _lift2(lambda x, e: math.ldexp(x, int(e))),
    "floatBitsToInt": _lift1(lambda x: int(np.float32(x).view(np.int32))),
    "floatBitsToUint": _lift1(lambda x: int(np.float32(x).view(np.uint32))),
    "intBitsToFloat": _lift1(
        lambda x: float(np.uint32(int(x) & 0xFFFFFFFF).view(np.float32))
    ),
    "uintBitsToFloat": _lift1(
        lambda x: float(np.uint32(int(x) & 0xFFFFFFFF).view(np.float32))
    ),
    "bitCount": _lift1(lambda x: bin(int(x) & 0xFFFFFFFF).count("1")),
    "findLSB": _lift1(_ref_find_lsb),
    "findMSB": _lift1(_ref_find_msb),
    "bitfieldReverse": _lift1(
        lambda x: int("{:032b}".format(int(x) & 0xFFFFFFFF)[::-1], 2)
    ),
    "bitfieldExtract": _lift3(
        lambda v, o, b: (((int(v) & 0xFFFFFFFF) >> int(o))
                         & ((1 << int(b)) - 1)) if int(b) else 0
    ),
    "bitfieldInsert": _lift4(_ref_bfi),
}


def _ref_pack(n, enc):
    def f(v):
        bits = 32 // n
        acc = 0
        for i, c in enumerate(v):
            acc |= (enc(c) & ((1 << bits) - 1)) << (bits * i)
        return acc
    return f


def _ref_unpack(n, dec):
    def f(u):
        bits = 32 // n
        u = int(u) & 0xFFFFFFFF
        return [dec((u >> (bits * i)) & ((1 << bits) - 1)) for i in range(n)]
    return f


def _ref_snorm_dec(bits, scale):
    half, full = 1 << (bits - 1), 1 << bits

    def dec(b):
        s = b - full if b >= half else b
        return min(max(s / scale, -1.0), 1.0)
    return dec


_BUILTINS.update({
    "packUnorm4x8": _ref_pack(
        4, lambda c: int(np.round(min(max(c, 0.0), 1.0) * 255.0))),
    "packSnorm4x8": _ref_pack(
        4, lambda c: int(np.round(min(max(c, -1.0), 1.0) * 127.0))),
    "packUnorm2x16": _ref_pack(
        2, lambda c: int(np.round(min(max(c, 0.0), 1.0) * 65535.0))),
    "packSnorm2x16": _ref_pack(
        2, lambda c: int(np.round(min(max(c, -1.0), 1.0) * 32767.0))),
    "packHalf2x16": _ref_pack(
        2, lambda c: int(np.float32(c).astype(np.float16).view(np.uint16))),
    "unpackUnorm4x8": _ref_unpack(4, lambda b: b / 255.0),
    "unpackSnorm4x8": _ref_unpack(4, _ref_snorm_dec(8, 127.0)),
    "unpackUnorm2x16": _ref_unpack(2, lambda b: b / 65535.0),
    "unpackSnorm2x16": _ref_unpack(2, _ref_snorm_dec(16, 32767.0)),
    "unpackHalf2x16": _ref_unpack(
        2, lambda b: float(np.uint16(b).view(np.float16))),
})


class ScalarRef:
    """Execute a compute shader per pixel in sequential GLSL semantics."""

    def __init__(self, src, images, params=None, time=0.0, stage="compute"):
        self.shader = parse_shader_source(src, stage)
        if self.shader.ssbos or self.shader.shared:
            raise RefUnsupported("ssbo/shared")
        self.params = dict(params or {})
        self.time = float(time)
        self.images = {}
        shapes = set()
        for name, arr in images.items():
            a = np.asarray(arr, np.float64).copy()
            assert a.ndim == 3 and a.shape[0] == 4, name
            self.images[name] = a
            shapes.add(a.shape[1:])
        assert len(shapes) == 1
        self.h, self.w = shapes.pop()
        declared = {img.name for img in self.shader.images}
        for img in self.shader.images:
            if img.name not in self.images:
                z = np.zeros((4, self.h, self.w))
                z[3] = 1.0
                self.images[img.name] = z
        if self.shader.stage == "fragment":
            for nm in ["output_image"] + list(self.shader.frag_outputs[1:]):
                declared.add(nm)
                if nm not in self.images:
                    self.images[nm] = np.zeros((4, self.h, self.w))
        for name in images:
            assert name in declared, name
        # Written and read image sets (AST pre-scan): read-after-write of
        # the same image would need the engine's in-flight store state.
        stored, loaded = set(), set()

        def scan(node):
            if isinstance(node, (list, tuple)):
                for x in node:
                    scan(x)
                return
            if not hasattr(node, "__dataclass_fields__"):
                return
            if isinstance(node, ast.Call) and node.args:
                if node.name == "imageStore":
                    stored.add(node.args[0].name)
                elif node.name in (
                    "imageLoad", "texture", "textureLod", "texelFetch",
                ):
                    loaded.add(node.args[0].name)
            for f in node.__dataclass_fields__:
                scan(getattr(node, f))

        for fn in self.shader.functions.values():
            scan(fn.body)
        if stored & loaded:
            raise RefUnsupported(f"read-after-write of {stored & loaded}")
        self._journal = []
        self._path = []

    # ---- values ---------------------------------------------------------

    def _zero(self, tname):
        if tname in ("float",):
            return 0.0
        if tname in ("int", "uint"):
            return 0
        if tname == "bool":
            return False
        if tname in VEC:
            elem, n = VEC[tname]
            return [self._zero(elem)] * n
        if tname in MAT:
            n = MAT[tname]
            return [[0.0] * n for _ in range(n)]
        if tname in self.shader.structs:
            return {f: self._zero(t) for t, f in self.shader.structs[tname]}
        if tname.endswith("]") and "[" in tname:
            elem, n = tname[:-1].split("[")
            return [self._zero(elem)] * int(n)
        raise RefUnsupported(f"zero of {tname}")

    def _convert(self, v, tname):
        if tname == "float":
            return float(v)
        if tname in ("int", "uint"):
            return int(v)
        if tname == "bool":
            return bool(v)
        if tname in VEC:
            elem, n = VEC[tname]
            if isinstance(v, list):
                assert len(v) == n
                return [self._convert(c, elem) for c in v]
            return [self._convert(v, elem)] * n
        return v

    # ---- execution ------------------------------------------------------

    def run(self):
        for y in range(self.h):
            for x in range(self.w):
                self._run_pixel(x, y)
        # Replay writes in lockstep-clock order (stable: same-clock
        # collisions keep pixel order — the engine's same-statement
        # scatter collisions are documented arbitrary-winner anyway).
        for _, name, cx, cy, vals in sorted(
            self._journal, key=lambda rec: rec[0]
        ):
            for c in range(4):
                self.images[name][c, cy, cx] = vals[c]
        return self.images

    def _run_pixel(self, x, y):
        self._path = []
        self._call_seq = 0
        g = {}
        g["gl_GlobalInvocationID"] = [x, y, 0]
        lsx, lsy, _ = self.shader.local_size
        g["gl_LocalInvocationID"] = [x % lsx, y % lsy, 0]
        g["gl_WorkGroupID"] = [x // lsx, y // lsy, 0]
        if self.shader.stage == "fragment":
            g["gl_FragCoord"] = [x + 0.5, y + 0.5, 0.0, 1.0]
            for vtype, vname in self.shader.frag_inputs:
                if vtype == "vec2":
                    g[vname] = [(x + 0.5) / self.w, (y + 0.5) / self.h]
                else:
                    g[vname] = self._zero(vtype)
            for vname in self.shader.frag_outputs:
                g[vname] = [0.0, 0.0, 0.0, 0.0]
        for ubo in self.shader.ubos:
            if ubo.instance_name:
                raise RefUnsupported("ubo instance blocks")
            for m in ubo.members:
                if m.name == "_rf_time" or m.name.endswith("_rf_time"):
                    g[m.name] = self.time
                elif m.array_size is not None:
                    g[m.name] = [self._zero(m.type)] * m.array_size
                else:
                    raw = self.params.get(m.name, 0)
                    g[m.name] = self._convert(raw, m.type)
        for d in self.shader.globals:
            if d.init is not None:
                g[d.name] = self.eval(d.init, [g])
            elif d.array_size is not None:
                size = self.eval(d.array_size, [g])
                g[d.name] = [self._zero(d.type)] * int(size)
            else:
                g[d.name] = self._zero(d.type)
        self.globals = g
        try:
            self.call_fn(self.shader.functions["main"], [], [g])
        except _Return:
            pass
        if self.shader.stage == "fragment":
            # The first frag output IS the node's output_image (the
            # engine's vkutils.rs:175-177 exemption analog); journal it
            # after all program writes (clock 'z' sorts last).
            names = ["output_image"] + list(self.shader.frag_outputs[1:])
            for img_name, vname in zip(names, self.shader.frag_outputs):
                val = g[vname]
                self._journal.append((
                    (("z", 0),), img_name, x, y,
                    [float(val[c]) for c in range(4)],
                ))

    def call_fn(self, fn, args, outer_scopes):
        scope = dict()
        scopes = [self.globals, scope]
        for p, a in zip(fn.params, args):
            if p.array_size is not None or p.type in self.shader.structs:
                scope[p.name] = a
            elif p.type in VEC or p.type in MAT:
                scope[p.name] = a
            else:
                scope[p.name] = self._convert(a, p.type)
        try:
            self.exec_block(fn.body, scopes)
        except _Return as r:
            return r.v, scope
        return None, scope

    def exec_block(self, stmts, scopes):
        scopes = scopes + [dict()]
        for i, s in enumerate(stmts):
            self._path.append(("s", i))
            self._call_seq = 0
            try:
                self.exec_stmt(s, scopes)
            finally:
                self._path.pop()

    def exec_stmt(self, s, scopes):
        if isinstance(s, ast.DeclList):
            for d in s.decls:
                self.exec_stmt(d, scopes)
            return
        if isinstance(s, ast.Decl):
            if s.array_size is not None:
                if s.init is not None:
                    scopes[-1][s.name] = self.eval(s.init, scopes)
                else:
                    n = int(self.eval(s.array_size, scopes))
                    scopes[-1][s.name] = [self._zero(s.type)] * n
            elif s.init is not None:
                v = self.eval(s.init, scopes)
                if s.type in VEC and not isinstance(v, list):
                    v = self._convert(v, s.type)
                elif s.type in ("float", "int", "uint", "bool"):
                    v = self._convert(v, s.type)
                scopes[-1][s.name] = v
            else:
                scopes[-1][s.name] = self._zero(s.type)
            return
        if isinstance(s, ast.ExprStmt):
            self.eval(s.expr, scopes)
            return
        if isinstance(s, ast.Block):
            self.exec_block(s.body, scopes)
            return
        if isinstance(s, ast.If):
            if self.eval(s.cond, scopes):
                self._path.append(("b", 0))
                try:
                    self.exec_block(s.then, scopes)
                finally:
                    self._path.pop()
            elif s.other is not None:
                self._path.append(("b", 1))
                try:
                    self.exec_block(s.other, scopes)
                finally:
                    self._path.pop()
            return
        if isinstance(s, ast.For):
            inner = scopes + [dict()]
            if s.init is not None:
                self.exec_stmt(s.init, inner)
            r = 0
            while s.cond is None or self.eval(s.cond, inner):
                self._path.append(("L", r))
                try:
                    self.exec_block(s.body, inner)
                except _Break:
                    self._path.pop()
                    break
                except _Continue:
                    pass
                if s.update is not None:
                    self.eval(s.update, inner)
                self._path.pop()
                r += 1
            return
        if isinstance(s, ast.While):
            r = 0
            while self.eval(s.cond, scopes):
                if r > 100000:
                    raise RefUnsupported("non-terminating loop")
                self._path.append(("L", r))
                try:
                    self.exec_block(s.body, scopes)
                except _Break:
                    self._path.pop()
                    break
                except _Continue:
                    pass
                self._path.pop()
                r += 1
            return
        if isinstance(s, ast.DoWhile):
            r = 0
            while True:
                self._path.append(("L", r))
                try:
                    self.exec_block(s.body, scopes)
                except _Break:
                    self._path.pop()
                    break
                except _Continue:
                    pass
                self._path.pop()
                r += 1
                if not self.eval(s.cond, scopes):
                    break
            return
        if isinstance(s, ast.Switch):
            sel = self.eval(s.selector, scopes)
            taking = False
            try:
                for values, body in s.cases:
                    if not taking:
                        if values is None or any(
                            v is None  # `default`
                            or int(self.eval(v, scopes)) == int(sel)
                            for v in values
                        ):
                            taking = True
                    if taking:
                        for st in body:
                            self.exec_stmt(st, scopes + [dict()])
            except _Break:
                pass
            return
        if isinstance(s, ast.Return):
            raise _Return(
                None if s.value is None else self.eval(s.value, scopes)
            )
        if isinstance(s, ast.Break):
            raise _Break()
        if isinstance(s, ast.Continue):
            raise _Continue()
        raise RefUnsupported(type(s).__name__)

    # ---- expressions ----------------------------------------------------

    def lookup(self, name, scopes):
        for sc in reversed(scopes):
            if name in sc:
                return sc
        raise RefUnsupported(f"undefined '{name}'")

    def eval(self, e, scopes):
        if isinstance(e, ast.Num):
            return float(e.value) if e.is_float else int(e.value)
        if isinstance(e, ast.BoolLit):
            return e.value
        if isinstance(e, ast.Ident):
            return self.lookup(e.name, scopes)[e.name]
        if isinstance(e, ast.Member):
            base = self.eval(e.expr, scopes)
            if isinstance(base, dict):
                return base[e.name]
            if len(e.name) == 1:
                return base[SWZ[e.name]]
            return [base[SWZ[c]] for c in e.name]
        if isinstance(e, ast.Index):
            base = self.eval(e.expr, scopes)
            # Clamp like the engine (robustBufferAccess convention for
            # dynamic indices; interp._dyn_index_plane).
            i = min(max(int(self.eval(e.index, scopes)), 0), len(base) - 1)
            return base[i]
        if isinstance(e, ast.ArrayLit):
            return [self.eval(x, scopes) for x in e.elems]
        if isinstance(e, ast.Unary):
            if e.op in ("++pre", "--pre", "++post", "--post"):
                old = self.eval(e.expr, scopes)
                new = old + (1 if "++" in e.op else -1)
                self.assign(e.expr, new, scopes)
                return old if e.op.endswith("post") else new
            v = self.eval(e.expr, scopes)
            if e.op == "-":
                return [-c for c in v] if isinstance(v, list) else -v
            if e.op == "!":
                return not v
            if e.op == "~":
                return ~int(v)
            raise RefUnsupported(f"unary {e.op}")
        if isinstance(e, ast.Ternary):
            return (
                self.eval(e.then, scopes)
                if self.eval(e.cond, scopes)
                else self.eval(e.other, scopes)
            )
        if isinstance(e, ast.Binary):
            return self.binop(e, scopes)
        if isinstance(e, ast.Assign):
            v = self.eval(e.value, scopes)
            if e.op != "=":
                cur = self.eval(e.target, scopes)
                v = self.apply_op(e.op[:-1], cur, v)
            self.assign(e.target, v, scopes)
            return v
        if isinstance(e, ast.Call):
            return self.call(e, scopes)
        raise RefUnsupported(type(e).__name__)

    def apply_op(self, op, a, b):
        if op == "+":
            return _lift2(lambda x, y: x + y)(a, b)
        if op == "-":
            return _lift2(lambda x, y: x - y)(a, b)
        if op == "*":
            if self._is_mat(a) or self._is_mat(b):
                return self._matmul(a, b)
            return _lift2(lambda x, y: x * y)(a, b)
        if op == "/":
            def div(x, y):
                if isinstance(x, int) and isinstance(y, int):
                    return int(x / y) if y else 0
                return x / y if y else math.inf * (1 if x > 0 else -1 if x < 0 else math.nan)
            return _lift2(div)(a, b)
        if op == "%":
            return _lift2(lambda x, y: int(x) % int(y) if y else 0)(a, b)
        if op == "<<":
            return int(a) << int(b)
        if op == ">>":
            return int(a) >> int(b)
        if op == "&":
            return int(a) & int(b)
        if op == "|":
            return int(a) | int(b)
        if op == "^":
            return int(a) ^ int(b)
        raise RefUnsupported(f"op {op}")

    @staticmethod
    def _is_mat(v):
        return (
            isinstance(v, list) and v and isinstance(v[0], list)
        )

    def _matmul(self, a, b):
        # GLSL column-major: mat * vec = sum_c col_c * v[c]; mat * mat
        # composes columns; vec * mat = dot(v, col_c) per column.
        if self._is_mat(a) and isinstance(b, list) and not self._is_mat(b):
            n = len(a)
            return [
                sum(a[c][r] * b[c] for c in range(n)) for r in range(len(a[0]))
            ]
        if self._is_mat(a) and self._is_mat(b):
            return [self._matmul(a, col) for col in b]
        if isinstance(a, list) and self._is_mat(b):
            return [
                sum(a[r] * b[c][r] for r in range(len(a))) for c in range(len(b))
            ]
        raise RefUnsupported("matrix shape")

    def binop(self, e, scopes):
        op = e.op
        if op == "&&":
            return bool(self.eval(e.left, scopes)) and bool(
                self.eval(e.right, scopes)
            )
        if op == "||":
            return bool(self.eval(e.left, scopes)) or bool(
                self.eval(e.right, scopes)
            )
        a = self.eval(e.left, scopes)
        b = self.eval(e.right, scopes)
        if op in ("==", "!="):
            eq = a == b
            return eq if op == "==" else not eq
        if op in ("<", "<=", ">", ">="):
            return {
                "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b
            }[op]
        return self.apply_op(op, a, b)

    def assign(self, target, v, scopes):
        if isinstance(target, ast.Ident):
            self.lookup(target.name, scopes)[target.name] = v
            return
        if isinstance(target, ast.Member):
            base = self.eval(target.expr, scopes)
            if isinstance(base, dict):
                base[target.name] = v
                return
            if len(target.name) == 1:
                base[SWZ[target.name]] = v
                return
            for i, c in enumerate(target.name):
                base[SWZ[c]] = v[i]
            return
        if isinstance(target, ast.Index):
            base = self.eval(target.expr, scopes)
            i = min(max(int(self.eval(target.index, scopes)), 0), len(base) - 1)
            base[i] = v
            return
        raise RefUnsupported("assign target")

    # ---- calls ----------------------------------------------------------

    def call(self, e, scopes):
        name = e.name
        if name in ("imageLoad",):
            img = self.images[e.args[0].name]
            cx, cy = (int(c) for c in self.eval(e.args[1], scopes)[:2])
            if 0 <= cx < self.w and 0 <= cy < self.h:
                return [float(img[c, cy, cx]) for c in range(4)]
            return [0.0, 0.0, 0.0, 0.0]
        if name == "imageStore":
            cx, cy = (int(c) for c in self.eval(e.args[1], scopes)[:2])
            val = self.eval(e.args[2], scopes)
            if 0 <= cx < self.w and 0 <= cy < self.h:
                self._journal.append((
                    tuple(self._path), e.args[0].name, cx, cy,
                    [float(val[c]) for c in range(4)],
                ))
            return None
        if name in ("imageSize", "textureSize"):
            return [self.w, self.h]
        if name in ("texture", "textureLod"):
            img = self.images[e.args[0].name]
            uv = self.eval(e.args[1], scopes)
            # Pixel centers at (i + 0.5) / size, clamp-to-edge bilinear —
            # exactly the engine's _texture.
            xf = uv[0] * self.w - 0.5
            yf = uv[1] * self.h - 0.5
            x0f, y0f = math.floor(xf), math.floor(yf)
            tx, ty = xf - x0f, yf - y0f
            x0 = min(max(int(x0f), 0), self.w - 1)
            x1 = min(max(x0 + 1, 0), self.w - 1)
            y0 = min(max(int(y0f), 0), self.h - 1)
            y1 = min(max(y0 + 1, 0), self.h - 1)
            out = []
            for c in range(4):
                p00, p01 = img[c, y0, x0], img[c, y0, x1]
                p10, p11 = img[c, y1, x0], img[c, y1, x1]
                top = p00 + (p01 - p00) * tx
                bot = p10 + (p11 - p10) * tx
                out.append(top + (bot - top) * ty)
            return out
        if name == "texelFetch":
            img = self.images[e.args[0].name]
            cx, cy = (int(c) for c in self.eval(e.args[1], scopes)[:2])
            cx = min(max(cx, 0), self.w - 1)
            cy = min(max(cy, 0), self.h - 1)
            return [float(img[c, cy, cx]) for c in range(4)]
        if name == "atan":
            args = [self.eval(a, scopes) for a in e.args]
            if len(args) == 2:
                return _lift2(math.atan2)(args[0], args[1])
            return _lift1(math.atan)(args[0])
        if name in ("length", "distance", "dot", "cross", "normalize"):
            args = [self.eval(a, scopes) for a in e.args]
            if name == "length":
                return math.sqrt(sum(c * c for c in args[0]))
            if name == "distance":
                return math.sqrt(
                    sum((x - y) ** 2 for x, y in zip(args[0], args[1]))
                )
            if name == "dot":
                return sum(x * y for x, y in zip(args[0], args[1]))
            if name == "cross":
                a, b = args
                return [
                    a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0],
                ]
            ln = math.sqrt(sum(c * c for c in args[0]))
            return [c / ln if ln else 0.0 for c in args[0]]
        if name in ("reflect", "refract", "faceforward"):
            args = [self.eval(a, scopes) for a in e.args]

            def vec(v):
                return v if isinstance(v, list) else [v]

            if name == "reflect":
                i, n = vec(args[0]), vec(args[1])
                d = sum(x * y for x, y in zip(n, i))
                out = [x - 2.0 * d * y for x, y in zip(i, n)]
            elif name == "refract":
                i, n = vec(args[0]), vec(args[1])
                eta = args[2]
                d = sum(x * y for x, y in zip(n, i))
                k = 1.0 - eta * eta * (1.0 - d * d)
                if k < 0.0:
                    out = [0.0] * len(i)
                else:
                    coef = eta * d + math.sqrt(k)
                    out = [eta * x - coef * y for x, y in zip(i, n)]
            else:
                nv, iv, nref = vec(args[0]), vec(args[1]), vec(args[2])
                d = sum(x * y for x, y in zip(nref, iv))
                out = [c if d < 0.0 else -c for c in nv]
            return out if isinstance(args[0], list) else out[0]
        if name in ("transpose", "determinant", "inverse",
                    "matrixCompMult", "outerProduct"):
            args = [self.eval(a, scopes) for a in e.args]

            def minor(d, n, i, j):
                rows = [r for r in range(n) if r != i]
                cols = [c for c in range(n) if c != j]
                return [[d[c][r] for r in rows] for c in cols]

            def det(d, n):
                if n == 1:
                    return d[0][0]
                if n == 2:
                    return d[0][0] * d[1][1] - d[1][0] * d[0][1]
                return sum(
                    (-1 if i % 2 else 1)
                    * d[0][i] * det(minor(d, n, i, 0), n - 1)
                    for i in range(n)
                )

            m = args[0]
            if name == "outerProduct":
                c, r = args
                return [[ci * rj for ci in c] for rj in r]
            n = len(m)
            if name == "transpose":
                return [[m[j][i] for j in range(n)] for i in range(n)]
            if name == "determinant":
                return det(m, n)
            if name == "matrixCompMult":
                return [[x * y for x, y in zip(ca, cb)]
                        for ca, cb in zip(m, args[1])]
            dv = det(m, n)
            return [
                [(-1 if (i + j) % 2 else 1)
                 * det(minor(m, n, j, i), n - 1) / dv
                 for i in range(n)]
                for j in range(n)
            ]
        if name in ("modf", "frexp"):
            x = self.eval(e.args[0], scopes)

            def one(c):
                if name == "modf":
                    f, w = math.modf(c)
                    return f, w
                # f32 semantics: the engine splits the raw f32 bits.
                m, ex = math.frexp(float(np.float32(c)))
                return m, ex

            if isinstance(x, list):
                pairs = [one(c) for c in x]
                self.assign(e.args[1], [p[1] for p in pairs], scopes)
                return [p[0] for p in pairs]
            f, o = one(x)
            self.assign(e.args[1], o, scopes)
            return f
        if name in _BUILTINS and _BUILTINS[name] is not None:
            args = [self.eval(a, scopes) for a in e.args]
            return _BUILTINS[name](*args)
        if name in ("float", "int", "uint", "bool"):
            return self._convert(self.eval(e.args[0], scopes), name)
        if name in VEC:
            elem, n = VEC[name]
            parts = []
            for a in e.args:
                v = self.eval(a, scopes)
                parts.extend(v if isinstance(v, list) else [v])
            if len(parts) == 1:
                parts = parts * n
            return [self._convert(c, elem) for c in parts[:n]]
        if name in MAT:
            n = MAT[name]
            parts = []
            for a in e.args:
                v = self.eval(a, scopes)
                parts.extend(v if isinstance(v, list) else [v])
            if len(parts) == 1:
                return [
                    [parts[0] if r == c else 0.0 for r in range(n)]
                    for c in range(n)
                ]
            if len(parts) == n and all(isinstance(p, list) for p in parts):
                return [list(p) for p in parts]
            assert len(parts) == n * n
            return [
                [parts[c * n + r] for r in range(n)] for c in range(n)
            ]
        if name == "__method_length":
            return len(self.eval(e.args[0], scopes))
        if name in self.shader.structs:
            fields = self.shader.structs[name]
            vals = [self.eval(a, scopes) for a in e.args]
            return {f: v for (_, f), v in zip(fields, vals)}
        if name in self.shader.functions:
            fn = self.shader.functions[name]
            args = [self.eval(a, scopes) for a in e.args]
            self._path.append(("c", self._call_seq))
            self._call_seq += 1
            saved_seq = self._call_seq
            try:
                ret, fscope = self.call_fn(fn, args, scopes)
            finally:
                self._path.pop()
                self._call_seq = saved_seq
            for p, a in zip(fn.params, e.args):
                if p.qualifier in ("out", "inout"):
                    self.assign(a, fscope[p.name], scopes)
            if ret is None and fn.return_type != "void":
                ret = self._zero_ret(fn.return_type)
            return ret
        raise RefUnsupported(f"call {name}")

    def _zero_ret(self, tname):
        if "[" in tname:
            elem, n = tname[:-1].split("[")
            return [self._zero(elem)] * int(n)
        return self._zero(tname)
