"""DSL parser + semantic pass tests.

Golden behavior mirrors the reference semantics (src/config/config.rs:98-205,
src/config/config_grammar.lalrpop).
"""

import pytest

from reforge_tpu import utils
from reforge_tpu.config import (
    FILE_INPUT,
    FINAL_OUTPUT,
    ConfigDescriptor,
    parse,
    parse_exprs,
    single_shader_parse,
)
from reforge_tpu.config.ast import GraphExpr, PipelineDecl
from reforge_tpu.config.parser import ConfigParseError


def descs(pairs):
    return [ConfigDescriptor(r, d) for r, d in pairs]


class TestGrammar:
    def test_simple_chain(self):
        exprs = parse_exprs("input -> blur -> output")
        assert len(exprs) == 1
        g = exprs[0]
        assert isinstance(g, GraphExpr)
        assert [m.name for m in g.members] == ["input", "blur", "output"]
        assert [m.descriptor for m in g.members] == [None, None, None]

    def test_descriptor_annotation(self):
        exprs = parse_exprs("input -> blur:tex -> output")
        assert exprs[0].members[1].descriptor == "tex"

    def test_pipeline_decl(self):
        exprs = parse_exprs("gauss: gaussian { sigma: 32, amount: -1.5, on: true }")
        decl = exprs[0]
        assert isinstance(decl, PipelineDecl)
        assert decl.name == "gauss"
        assert decl.pipeline_type == "gaussian"
        assert decl.parameters["sigma"].value == 32
        assert decl.parameters["amount"].value == -1.5
        assert decl.parameters["on"].value is True

    def test_empty_params(self):
        exprs = parse_exprs("gauss: gaussian {}")
        assert exprs[0].parameters == {}

    def test_comments(self):
        src = """
        // line comment
        input -> blur -> output
        /* block
           comment */
        blur: gaussian { sigma: 4 }  // trailing
        """
        exprs = parse_exprs(src)
        assert len(exprs) == 2

    def test_comment_inside_expressions_allowed(self):
        # Strict superset of the reference: comments admitted mid-expression.
        exprs = parse_exprs("input -> /* mid */ blur -> output")
        assert [m.name for m in exprs[0].members] == ["input", "blur", "output"]

    def test_multiple_chains(self):
        src = "input -> blur -> blend -> output\ninput -> sharpen -> blend:second"
        exprs = parse_exprs(src)
        assert len(exprs) == 2

    def test_arrow_without_spaces(self):
        exprs = parse_exprs("input->blur->output")
        assert [m.name for m in exprs[0].members] == ["input", "blur", "output"]

    def test_single_ident_is_error(self):
        with pytest.raises(ConfigParseError):
            parse_exprs("blur")

    def test_bad_token_is_invalid_token_error(self):
        with pytest.raises(ConfigParseError) as exc:
            parse_exprs("input -> blur @ output")
        assert "Invalid token '@' at line 1" in exc.value.messages[0]

    def test_unrecognized_token_reports_expected(self):
        with pytest.raises(ConfigParseError) as exc:
            parse_exprs("a2 -> b2 : blur { sigma: 1 }")
        assert "Unrecognized token" in exc.value.messages[0]
        assert "Expected to find" in exc.value.messages[1]

    def test_error_line_numbers(self):
        with pytest.raises(ConfigParseError) as exc:
            parse_exprs("input -> blur -> output\n&bad")
        assert "line 2" in exc.value.messages[0]

    def test_negative_int_accepted(self):
        # Deliberate superset: the reference grammar signs floats but not
        # ints (config_grammar.lalrpop:74-78) — surely an oversight, so
        # "sigma: -3" parses here like "sigma: -3.0" does there.
        exprs = parse_exprs("gs: gaussian { sigma: -3 }")
        assert exprs is not None


class TestSemantics:
    def test_linear_chain_wiring(self):
        cfg = parse("input -> blur -> sharpen -> output", expects_input=True)
        assert set(cfg.graph_pipelines) == {"blur", "sharpen"}
        blur = cfg.graph_pipelines["blur"]
        assert blur.inputs == descs([(FILE_INPUT, "input_image")])
        assert blur.outputs == descs([("blur:output_image", "output_image")])
        sharpen = cfg.graph_pipelines["sharpen"]
        assert sharpen.inputs == descs([("blur:output_image", "input_image")])
        assert sharpen.outputs == descs([(FINAL_OUTPUT, "output_image")])

    def test_descriptor_annotation_names_input_and_output(self):
        # Reference quirk: `b:tex` names BOTH b's input binding and b's
        # output resource (config.rs:164-189).
        cfg = parse("input -> mid:tex -> last -> output", expects_input=True)
        mid = cfg.graph_pipelines["mid"]
        assert mid.inputs == descs([(FILE_INPUT, "tex")])
        assert mid.outputs == descs([("mid:tex", "tex")])
        last = cfg.graph_pipelines["last"]
        assert last.inputs == descs([("mid:tex", "input_image")])

    def test_fan_in(self):
        src = (
            "input -> blur -> blend -> output\n"
            "input -> sharpen -> blend:input_image2\n"
        )
        cfg = parse(src, expects_input=True)
        blend = cfg.graph_pipelines["blend"]
        assert ConfigDescriptor("blur:output_image", "input_image") in blend.inputs
        # In the second chain, blend carries the :input_image2 annotation,
        # binding sharpen's output to that descriptor.
        assert ConfigDescriptor("sharpen:output_image", "input_image2") in blend.inputs

    def test_instances(self):
        cfg = parse(
            "input -> gs -> output\ngs: gaussian { sigma: 8 }", expects_input=True
        )
        assert cfg.pipeline_type_of("gs") == "gaussian"
        assert cfg.parameters_of("gs")["sigma"].value == 8
        assert cfg.pipeline_type_of("undeclared") == "undeclared"

    def test_input_without_image_is_error(self):
        assert parse("input -> blur -> output", expects_input=False) is None
        assert any("no input image" in w for w in utils.recent_warnings())

    def test_no_output_is_error(self):
        assert parse("input -> blur -> sharpen", expects_input=True) is None
        assert any("'output' is never used" in w for w in utils.recent_warnings())

    def test_empty_graph_is_error(self):
        assert parse("gs: gaussian { sigma: 1 }", expects_input=True) is None
        assert any("empty graph" in w for w in utils.recent_warnings())

    def test_empty_config_is_error(self):
        assert parse("   \n  ", expects_input=True) is None
        assert any("Empty configuration" in w for w in utils.recent_warnings())

    def test_parse_error_returns_none_with_warning(self):
        assert parse("input -> @", expects_input=True) is None
        assert any("Invalid token" in w for w in utils.recent_warnings())

    def test_generator_graph_no_input(self):
        cfg = parse("noise -> output", expects_input=False)
        assert set(cfg.graph_pipelines) == {"noise"}
        assert cfg.graph_pipelines["noise"].inputs == []

    def test_single_shader_parse(self):
        cfg = single_shader_parse("/tmp/somewhere/blur.comp", expects_input=True)
        assert set(cfg.graph_pipelines) == {"blur"}
        assert cfg.graph_pipelines["blur"].file_path == "/tmp/somewhere/blur.comp"
        assert cfg.graph_pipelines["blur"].inputs == descs([(FILE_INPUT, "input_image")])

    def test_duplicate_edges_dedupe(self):
        cfg = parse(
            "input -> blur -> output\ninput -> blur -> output", expects_input=True
        )
        blur = cfg.graph_pipelines["blur"]
        assert len(blur.inputs) == 1
        assert len(blur.outputs) == 1
