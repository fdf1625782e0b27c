"""GLSL tokenizer.

Covers the GLSL 4.5 compute-shader subset used by image filters: the same
source language the reference compiles with shaderc at runtime
(reference: src/vulkan/shader.rs:73-93).  Supports ``//`` and ``/* */``
comments, ``#version``/``#extension`` directives (ignored), and object-like
``#define`` macros (token-level substitution).
"""

from __future__ import annotations

import dataclasses
import re

_HEX_RE = re.compile(r"0[xX][0-9a-fA-F]+[uU]?")
# Floats need a '.', an exponent, or an f/F suffix to be floats.
_FLOAT_RE = re.compile(r"(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?[fF]?|\d+(?:[eE][+-]?\d+)[fF]?|\d+[fF]")
_INT_RE = re.compile(r"\d+[uU]?")


class GlslError(Exception):
    """Compile error with line info, printed like shaderc diagnostics."""

    def __init__(self, msg: str, line: int | None = None):
        self.line = line
        self.msg = msg
        super().__init__(f"line {line}: {msg}" if line else msg)


@dataclasses.dataclass(frozen=True)
class Tok:
    kind: str  # 'id' | 'int' | 'float' | 'op' | 'eof'
    text: str
    line: int


KEYWORDS = {
    "void", "float", "int", "uint", "bool", "double",
    "vec2", "vec3", "vec4", "ivec2", "ivec3", "ivec4",
    "uvec2", "uvec3", "uvec4", "bvec2", "bvec3", "bvec4",
    "mat2", "mat3", "mat4",
    "if", "else", "for", "while", "do", "return", "break", "continue",
    "true", "false", "const", "in", "out", "inout", "uniform", "buffer",
    "layout", "readonly", "writeonly", "coherent", "volatile", "restrict",
    "image2D", "sampler2D", "struct", "discard", "precision", "highp",
    "mediump", "lowp", "shared",
}

# Multi-char operators, longest first.
_OPS3 = ["<<=", ">>=", "..."]
_OPS2 = [
    "==", "!=", "<=", ">=", "&&", "||", "++", "--", "+=", "-=", "*=", "/=",
    "%=", "&=", "|=", "^=", "<<", ">>",
]


def tokenize(src: str) -> list[Tok]:
    # Pass 1: strip comments, collect #define macros, drop other directives.
    macros: dict[str, str] = {}
    lines_out: list[str] = []
    i = 0
    n = len(src)
    in_block_comment = False
    for lineno, raw in enumerate(src.split("\n"), start=1):
        line = raw
        if in_block_comment:
            end = line.find("*/")
            if end < 0:
                lines_out.append("")
                continue
            line = " " * (end + 2) + line[end + 2 :]
            in_block_comment = False
        # Strip comments on this line (handling // and /* */ pairs).
        out = []
        j = 0
        while j < len(line):
            if line.startswith("//", j):
                break
            if line.startswith("/*", j):
                end = line.find("*/", j + 2)
                if end < 0:
                    in_block_comment = True
                    break
                j = end + 2
                out.append(" ")
                continue
            out.append(line[j])
            j += 1
        clean = "".join(out)
        stripped = clean.strip()
        if stripped.startswith("#"):
            parts = stripped[1:].split(None, 2)
            if parts and parts[0] == "define":
                if len(parts) == 2:
                    macros[parts[1]] = ""
                elif len(parts) == 3 and "(" not in parts[1]:
                    macros[parts[1]] = parts[2]
                # Function-like macros unsupported: leave uses to fail
                # at parse with a clear message.
            lines_out.append("")
        else:
            lines_out.append(clean)

    toks: list[Tok] = []

    def emit_text(text: str, line: int) -> None:
        """Tokenize a chunk (used for macro bodies too)."""
        k = 0
        m = len(text)
        while k < m:
            c = text[k]
            if c in " \t\r":
                k += 1
                continue
            if c.isdigit() or (c == "." and k + 1 < m and text[k + 1].isdigit()):
                mo = _HEX_RE.match(text, k)
                if mo:
                    toks.append(Tok("int", mo.group(0), line))
                    k = mo.end()
                    continue
                mo = _FLOAT_RE.match(text, k)
                if mo:
                    toks.append(Tok("float", mo.group(0), line))
                    k = mo.end()
                    continue
                mo = _INT_RE.match(text, k)
                assert mo is not None
                toks.append(Tok("int", mo.group(0), line))
                k = mo.end()
                continue
            if c.isalpha() or c == "_":
                j = k
                while j < m and (text[j].isalnum() or text[j] == "_"):
                    j += 1
                word = text[k:j]
                if word in macros and macros[word] != "":
                    emit_text(macros[word], line)
                else:
                    toks.append(Tok("id", word, line))
                k = j
                continue
            matched = False
            for op in _OPS3 + _OPS2:
                if text.startswith(op, k):
                    toks.append(Tok("op", op, line))
                    k += len(op)
                    matched = True
                    break
            if matched:
                continue
            if c in "+-*/%<>=!&|^~?:;,.(){}[]":
                toks.append(Tok("op", c, line))
                k += 1
                continue
            raise GlslError(f"unexpected character {c!r}", line)

    for lineno, line in enumerate(lines_out, start=1):
        emit_text(line, lineno)

    toks.append(Tok("eof", "", len(lines_out)))
    return toks
