"""Property-based kernel tests (hypothesis). The reference ships no
property tests (SURVEY.md §5); these pin the kernel's algebraic
invariants: totality, idempotence, determinism, and structural
guarantees, over adversarial unicode text.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2ocr_spark.kernel.emit import extract_document, wrap_paragraph
from pdf2ocr_spark.kernel.textproc import (
    RE_SENTENCE_BOUNDARY,
    clean_portuguese_charset,
    reassemble_paragraphs,
    rebuild_paragraphs,
    repair_ligatures,
    split_paragraph_by_sentences,
    strip_boilerplate_lines,
    _RE_PT_DISALLOWED,
)

TEXT_ALPHABET = (
    "abcdefghijz ABCDEFZ 0123456789.!?;:…•-–—▪()\n\táéíçã€ßﬁﬂ\r"
)
texts = st.text(alphabet=TEXT_ALPHABET, max_size=300)
lines_st = st.lists(
    st.text(alphabet="abcz ABZ 09.!\n", max_size=40), max_size=8
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_rebuild_total_and_deterministic(t):
    a = rebuild_paragraphs(t)
    b = rebuild_paragraphs(t)
    assert a == b
    # no paragraph is blank, none contains a stray \n except separators
    for para in a.split("\n\n"):
        assert "\n" not in para


@settings(max_examples=200, deadline=None)
@given(texts)
def test_repair_ligatures_idempotent(t):
    once = repair_ligatures(t)
    assert repair_ligatures(once) == once
    # unicode ligature codepoints never survive
    assert not any(c in once for c in "ﬀﬁﬂﬃﬄ")


@settings(max_examples=200, deadline=None)
@given(texts)
def test_pt_clean_idempotent_and_allowlisted(t):
    once = clean_portuguese_charset(t)
    assert clean_portuguese_charset(once) == once
    assert not _RE_PT_DISALLOWED.search(once)


@settings(max_examples=100, deadline=None)
@given(lines_st)
def test_boilerplate_preserves_shape(pages):
    out = strip_boilerplate_lines(pages)
    assert len(out) == len(pages)
    if len(pages) < 3:
        assert out == list(pages)
    for before, after in zip(pages, out):
        kept = after.split("\n") if after else [""]
        # every kept line existed in the source page
        src = before.split("\n")
        for ln in kept:
            if ln:
                assert ln in src


@settings(max_examples=200, deadline=None)
@given(texts)
def test_reassemble_paragraphs_clean(t):
    paras = reassemble_paragraphs(t)
    for p in paras:
        assert p == p.strip()
        assert "\n" not in p
        # NOTE: internal runs of spaces WITHIN one source line survive —
        # the reference collapses whitespace only across line joins
        # (common.py:211-212), e.g. '0  0' stays '0  0'. Only line-join
        # whitespace is guaranteed single:
    if "  " not in t:
        for p in paras:
            assert "  " not in p


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abc .!?…", min_size=1, max_size=200),
    st.integers(min_value=1, max_value=6),
)
def test_sentence_split_bounds(t, k):
    chunks = split_paragraph_by_sentences(t, k)
    n_sent = len(RE_SENTENCE_BOUNDARY.split(t))
    if n_sent <= k:
        assert chunks == [t]
    else:
        for c in chunks:
            assert len(RE_SENTENCE_BOUNDARY.split(c)) <= k
        assert c.strip() != "" or not chunks


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef ghij", max_size=400), st.integers(5, 120))
def test_wrap_roundtrip(t, cols):
    lines = wrap_paragraph(t, cols)
    assert " ".join(lines).split() == t.split()
    for ln in lines:
        assert len(ln) <= cols or " " not in ln  # overlong single word


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["page", "media"]),
            st.text(alphabet="abz .!\n", max_size=60),
        ),
        max_size=6,
    ),
    st.randoms(),
)
def test_extract_invariant_under_span_order(span_specs, rnd):
    spans = [
        {
            "kind": kind,
            "text": text if kind == "page" else None,
            "media_ref": f"m{i}" if kind == "media" else None,
            "offset": i,
        }
        for i, (kind, text) in enumerate(span_specs)
    ]
    base = extract_document("d", spans)
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    assert extract_document("d", shuffled) == base


# --- whole-doc FSM == per-page FSM + boundary merge --------------------------

_page_lines = st.lists(
    st.one_of(
        st.text(alphabet="abcdefgh .!?:;•-–—01239ACZ\n", min_size=0, max_size=24),
        st.sampled_from([
            "", "7", "pdf2ocr - Page 3", "CAPITULO UM", "• item", "2. ponto",
            "ends with fi", "lter tail", "Upper Start.", "lower tail",
        ]),
    ),
    min_size=0, max_size=8,
)
_doc_pages = st.lists(_page_lines.map("\n".join), min_size=0, max_size=5)


@settings(max_examples=300, deadline=None)
@given(_doc_pages)
def test_merge_equals_whole_doc_fsm(pages):
    """merge_page_paragraphs over per-page FSM runs must reproduce the
    direct whole-document FSM exactly (the emit fast path depends on it)."""
    from pdf2ocr_spark.kernel.textproc import (
        merge_page_paragraphs,
        rebuild_paragraphs,
        rebuild_paragraphs_meta,
        repair_ligatures,
    )

    direct = rebuild_paragraphs("\n\n".join(pages))
    metas = [rebuild_paragraphs_meta(p) for p in pages]
    derived = repair_ligatures("\n\n".join(merge_page_paragraphs(metas)))
    if not "\n\n".join(pages).splitlines():
        return  # rebuild_paragraphs returns input verbatim for empty input
    assert derived == direct


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abc123", min_size=0, max_size=8), st.integers(1, 200))
def test_docgen_draws_match_stream(doc_id, n):
    """_draw_block must reproduce _seed_stream's value sequence exactly —
    the corpus identity across rounds depends on it."""
    from pdf2ocr_spark.kernel.docgen import _draw_block, _seed_stream

    gen = _seed_stream(doc_id)
    block = _draw_block(doc_id, (n + 3) // 4)
    assert [next(gen) for _ in range(n)] == block[:n]
