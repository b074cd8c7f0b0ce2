"""Language unit tests: tokenizer, parser, error spans (SURVEY.md §4 item 1)."""

import pytest

from mathmap_tpu.lang import astnodes as A
from mathmap_tpu.lang.parser import parse
from mathmap_tpu.lang.tokens import tokenize
from mathmap_tpu.utils.errors import MMSyntaxError


def test_tokenize_numbers_and_ops():
    toks = tokenize("1 + 2.5e-3 * x_1 # comment\n[a,b]")
    kinds = [(t.kind, t.text) for t in toks]
    assert ("num", "1") in kinds
    assert ("num", "2.5e-3") in kinds
    assert ("ident", "x_1") in kinds
    assert ("op", "[") in kinds
    assert kinds[-1][0] == "eof"


def test_tokenize_multichar_ops():
    toks = tokenize("a == b != c <= d >= e && f || g")
    ops = [t.text for t in toks if t.kind == "op"]
    assert ops == ["==", "!=", "<=", ">=", "&&", "||"]


def test_tokenize_block_comment():
    toks = tokenize("1 /* a\nb */ 2")
    assert [t.text for t in toks if t.kind == "num"] == ["1", "2"]


def test_tokenize_error_has_span():
    with pytest.raises(MMSyntaxError) as ei:
        tokenize("x @ y")
    assert ei.value.span.line == 1
    assert ei.value.span.col == 3


def test_parse_bare_expression_wraps_filter():
    prog = parse("x + y")
    assert len(prog.filters) == 1
    f = prog.filters[0]
    assert f.params[0].kind == "image"
    assert f.params[0].name == "in"


def test_parse_filter_with_params():
    prog = parse(
        "filter f (image in, float d: 0-1 (0.5), int n: 1-10 (3), bool b, color c)\n"
        "  in(xy)\nend"
    )
    f = prog.filters[0]
    assert f.name == "f"
    kinds = [p.kind for p in f.params]
    assert kinds == ["image", "float", "int", "bool", "color"]
    assert f.params[1].lo == 0 and f.params[1].hi == 1 and f.params[1].default == 0.5
    assert f.params[2].default == 3


def test_parse_negative_param_range():
    prog = parse("filter f (float a: -10-10 (-3)) grayColor(a) end")
    p = prog.filters[0].params[0]
    assert p.lo == -10 and p.hi == 10 and p.default == -3


def test_parse_precedence():
    prog = parse("1 + 2 * 3 ^ 4 == 5")
    body = prog.filters[0].body.items[0]
    assert isinstance(body, A.BinOp) and body.op == "=="
    add = body.left
    assert add.op == "+"
    mul = add.right
    assert mul.op == "*"
    assert mul.right.op == "^"


def test_parse_unary_pow():
    # x^-2 parses with unary exponent; -x^2 = -(x^2)
    prog = parse("x^-2 + -x^2")
    add = prog.filters[0].body.items[0]
    assert add.left.op == "^"
    assert isinstance(add.left.right, A.UnOp)
    assert isinstance(add.right, A.UnOp)
    assert add.right.operand.op == "^"


def test_parse_tag_cast_vs_subscript():
    prog = parse("p = ra:[1, 2]; p[0] + ri:x")
    seq = prog.filters[0].body
    assign = seq.items[0]
    assert isinstance(assign.expr, A.Cast) and assign.expr.tag == "ra"
    expr = seq.items[1]
    assert isinstance(expr.left, A.Subscript)
    assert isinstance(expr.right, A.Cast) and expr.right.tag == "ri"


def test_parse_sub_assignment():
    prog = parse("v = [1,2,3]; v[1] = 5; v[1]")
    stmt = prog.filters[0].body.items[1]
    assert isinstance(stmt, A.SubAssign) and stmt.name == "v"


def test_parse_if_else_chain():
    prog = parse("if x then 1 else if y then 2 else 3 end end")
    node = prog.filters[0].body.items[0]
    assert isinstance(node, A.If)
    assert isinstance(node.orelse.items[0], A.If)


def test_nested_if_needs_own_end():
    # no `elseif` sugar: every nested if requires its own `end`
    with pytest.raises(MMSyntaxError):
        parse("if x then 1 else if y then 2 else 3 end")


def test_parse_while():
    prog = parse("i = 0; while i < 10 do i = i + 1 end; grayColor(i)")
    node = prog.filters[0].body.items[1]
    assert isinstance(node, A.While) and not node.post


def test_parse_do_while():
    prog = parse("i = 0; do i = i + 1 while i < 10 end; grayColor(i)")
    node = prog.filters[0].body.items[1]
    assert isinstance(node, A.While) and node.post


def test_parse_multi_filter_file():
    prog = parse("filter a (image in) in(xy) end filter b (image in) a(in)(xy) end")
    assert [f.name for f in prog.filters] == ["a", "b"]


def test_parse_error_span():
    with pytest.raises(MMSyntaxError) as ei:
        parse("1 + ")
    assert ei.value.span.line == 1


def test_assigned_names():
    prog = parse("i = 0; while i < 3 do i = i + 1; j = i end")
    names = A.assigned_names(prog.filters[0].body)
    assert names == {"i", "j"}


def test_nested_while_inside_do_while_body():
    """A while STATEMENT inside a do-while body must parse (review r3:
    the leading 'while' was misread as the do-while terminator)."""
    import numpy as np

    import mathmap_tpu as mm

    src = ("a = 0; b = 2; do a = 1; while a < 5 do a = a + 1 end; "
           "b = b - 1 while b > 0 end; grayColor(a / 8)")
    f = mm.compile(src)
    img = np.zeros((6, 8, 4), np.float32)
    o = np.asarray(f.render(img, interpret=True))[..., 0]
    j = np.asarray(f.render(img))[..., 0]
    np.testing.assert_allclose(o, 0.625, atol=1e-6)
    np.testing.assert_allclose(j, o, atol=1e-6)


# ---------------------------------------------------------------------------
# review r5: expression-position assignment + user-defined (interned) tags
# ---------------------------------------------------------------------------


def test_assignment_is_an_expression():
    """The reference grammar is expression-oriented: assignment nests
    (`x = y = 1`, `q = (p = 2) * 3`) and yields the assigned value
    (review r5 — previously only recognized at statement level)."""
    import numpy as np

    import mathmap_tpu as mm

    f = mm.compile("filter f () p = 0; q = p = 0.3; grayColor(q + p) end")
    assert abs(float(np.asarray(
        f.render(width=2, height=2, interpret=True))[0, 0, 0]) - 0.6) < 1e-6
    f = mm.compile("filter f () q = (p = 0.2) * 2; grayColor(q + p) end")
    assert abs(float(np.asarray(
        f.render(width=2, height=2, interpret=True))[0, 0, 0]) - 0.6) < 1e-6
    f = mm.compile(
        "filter f () v = xy:[0, 0]; q = v[1] = 0.35; grayColor(q) end")
    assert abs(float(np.asarray(
        f.render(width=2, height=2, interpret=True))[0, 0, 0]) - 0.35) < 1e-6


def test_user_defined_tags_parse_and_dispatch():
    """ANY identifier before ':' is a tag (the reference registry interns
    names — review r5: unknown tags were a misleading syntax error).
    Unknown tags carry no arity constraint and flow through ops."""
    import numpy as np

    import mathmap_tpu as mm

    f = mm.compile(
        "filter f () v = foo:[0.1, 0.2] + foo:[0.1, 0.2]; "
        "grayColor(v[1]) end")
    assert abs(float(np.asarray(
        f.render(width=2, height=2, interpret=True))[0, 0, 0]) - 0.4) < 1e-6
