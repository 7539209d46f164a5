"""Property-based tests (hypothesis) for the transpiler's text machinery.

The reference parses SQL with a real grammar (SqlBase.g4); our transpiler is
textual, so its safety rests on two invariants the examples in
test_presto_dialect.py can't exhaustively pin:

1. literal masking round-trips any string content (including quotes,
   doubled-quote escapes, parens, function-looking text), and
2. transpile() never alters text inside string literals.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lyft_presto_spark.functions.presto import (
    _mask_literals,
    _split_args,
    _unmask,
    transpile,
)

# Text that may contain quote-escape sequences, function-ish names, parens.
_literal_body = st.text(
    alphabet=st.sampled_from(list("abc ,()'%\\$_123strpos(date_add(")), max_size=30
)


@given(_literal_body)
@settings(max_examples=300, deadline=None)
def test_mask_roundtrip_single_literal(body):
    sql = "SELECT '" + body.replace("'", "''") + "' AS x"
    masked, lits = _mask_literals(sql)
    assert "'" not in masked  # every literal fully masked
    assert _unmask(masked, lits) == sql


@given(st.lists(_literal_body, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_transpile_preserves_literal_content(bodies):
    lits = ["'" + b.replace("'", "''") + "'" for b in bodies]
    sql = "SELECT " + ", ".join(f"{lit} AS c{i}" for i, lit in enumerate(lits))
    out = transpile(sql)
    for lit in lits:
        assert lit in out  # literal text survives byte-for-byte


@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("ab1_.")), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_args_top_level_commas(parts):
    # Wrap every part in nested calls/brackets: commas inside must not split.
    wrapped = [f"f({p}, g([{p}, {p}]))" for p in parts]
    argstr = ", ".join(wrapped)
    got = _split_args(argstr)
    assert got == wrapped


@given(st.text(alphabet=st.sampled_from(list("SELCT abcxyz_123*=<>.,")), max_size=60))
@settings(max_examples=300, deadline=None)
def test_transpile_identity_without_registered_names(text):
    # No registered function name followed by '(' -> transpile is identity.
    if "(" in text:
        return
    assert transpile(text) == text


# --- ARRAY[...] literal rewriting invariants --------------------------------

_array_elem = st.sampled_from(["1", "2.5", "x", "'a,b'", "f(y)", "m['k']"])


def _mk_array(elems, depth):
    inner = ", ".join(elems) if elems else "1"
    s = f"ARRAY[{inner}]"
    for _ in range(depth):
        s = f"ARRAY[{s}, {inner}]"
    return s


@given(st.lists(_array_elem, min_size=0, max_size=4), st.integers(0, 3))
@settings(max_examples=200, deadline=None)
def test_array_literal_rewrite_balanced(elems, depth):
    """Every ARRAY[..] becomes array(..): balanced parens, no brackets left."""
    sql = "SELECT " + _mk_array(elems, depth) + " AS a"
    out = transpile(sql)
    assert "ARRAY[" not in out.upper()
    assert out.count("(") == out.count(")")
    # subscript brackets (m['k']) survive untouched
    if any("m['k']" in e for e in elems):
        assert "m['k']" in out


@given(st.lists(_array_elem, min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_array_inside_string_literal_untouched(elems):
    """ARRAY[ text inside a string literal is data, not syntax."""
    lit = "ARRAY[" + ",".join(e.replace("'", "''") for e in elems) + "]"
    sql = "SELECT '" + lit + "' AS s"
    assert transpile(sql) == sql


@given(st.sampled_from(["arr", "map_col", "split(x, ',')"]), st.integers(-5, 99))
@settings(max_examples=100, deadline=None)
def test_element_at_always_becomes_try(container, idx):
    out = transpile(f"SELECT element_at({container}, {idx}) AS v")
    assert "try_element_at(" in out
    assert " element_at(" not in out.replace("try_element_at", "")
