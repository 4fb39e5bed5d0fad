"""Highlighter tests — the snippet analog (reference snippet_bench.cc and
highlighter tests)."""

from wiser_tpu.highlighter import SimpleHighlighter, _BreakIterator


class TestBreakIterator:
    def test_sentence_bounds(self):
        doc = "First one. Second two. Third three."
        b = _BreakIterator(doc)
        assert b.next_containing(0)
        assert doc[b.startoffset : b.endoffset + 1] == "First one."
        assert b.next_containing(12)
        assert doc[b.startoffset : b.endoffset + 1] == " Second two."

    def test_no_period(self):
        doc = "no periods here at all"
        b = _BreakIterator(doc)
        assert b.next_containing(3)
        assert b.endoffset == len(doc) - 1


class TestHighlighter:
    def test_single_match(self):
        doc = "hello world. goodbye moon."
        # "world" at offsets (6, 10)
        out = SimpleHighlighter().highlight([[(6, 10)]], 3, doc)
        assert "<b>world<\\b>" in out
        assert out.startswith("hello")

    def test_two_terms_same_passage(self):
        doc = "alpha beta gamma. delta."
        out = SimpleHighlighter().highlight([[(0, 4)], [(11, 15)]], 3, doc)
        assert "<b>alpha<\\b>" in out and "<b>gamma<\\b>" in out

    def test_passage_limit(self):
        doc = "t one. t two. t three. t four."
        offs = [[(0, 0), (7, 7), (14, 14), (23, 23)]]
        out = SimpleHighlighter().highlight(offs, 2, doc)
        # only 2 passages survive
        assert out.count("<b>") == 2

    def test_empty(self):
        assert SimpleHighlighter().highlight([], 3, "doc") == ""
