"""tools/docsplice.py — the shared marker-bounded SCALING.md splice.

Pins the exact failure class from VERDICT r8 "What's wrong #1": a
splice that stops only at `\\n## ` swallows a trailing ###-level
section to EOF.  The shared helper must stop at the next heading of
ANY level and leave every byte outside the replaced section intact.
No Spark needed — pure text surgery.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.docsplice import _split, splice_section  # noqa: E402

DOC = (
    "# Title\n"
    "\n"
    "intro prose\n"
    "\n"
    "## Decade stress\n"
    "\n"
    "| a | b |\n"
    "\n"
    "## Streaming state scale under RocksDB\n"
    "\n"
    "old state table row 1\n"
    "old state table row 2\n"
    "\n"
    "### pipeline_corpus_build decomposition (round 8)\n"
    "\n"
    "decomposition table — the r8 casualty\n"
)


def test_resplice_preserves_trailing_subsection(tmp_path):
    """The r8 bug verbatim: re-splicing the ##-level state section must
    NOT eat the ###-level section sitting after it at EOF."""
    md = tmp_path / "SCALING.md"
    md.write_text(DOC)
    mark = "## Streaming state scale under RocksDB"
    splice_section(md, mark, mark + "\n\nnew state table\n")
    out = md.read_text()
    assert "new state table" in out
    assert "old state table row 1" not in out
    # the trailing ### section survives byte-identical
    assert out.endswith(
        "### pipeline_corpus_build decomposition (round 8)\n"
        "\n"
        "decomposition table — the r8 casualty\n"
    )
    # and everything before the marker is untouched
    assert out.startswith("# Title\n\nintro prose\n\n## Decade stress\n")


def test_resplice_is_idempotent_outside_section(tmp_path):
    """Two consecutive splices of different bodies: the second sees the
    first's section, and head/tail never drift."""
    md = tmp_path / "SCALING.md"
    md.write_text(DOC)
    mark = "### pipeline_corpus_build decomposition"
    before = _split(DOC, mark, ("## ", "### "))
    splice_section(md, mark, mark + " (round 9)\n\nbody A\n")
    splice_section(md, mark, mark + " (round 9)\n\nbody B longer than A\n")
    after = _split(md.read_text(), mark, ("## ", "### "))
    assert after[0] == before[0] and after[2] == before[2] == ""
    assert "body B longer than A" in md.read_text()
    assert "body A" not in md.read_text()


def test_append_when_marker_absent(tmp_path):
    md = tmp_path / "SCALING.md"
    md.write_text("# Title\n\nprose\n")
    splice_section(md, "## New section", "## New section\n\nfresh\n")
    assert md.read_text() == "# Title\n\nprose\n\n## New section\n\nfresh\n"


def test_mid_file_section_bounded_by_next_h2(tmp_path):
    """Replacing a mid-file ## section stops at the following ## too."""
    md = tmp_path / "SCALING.md"
    md.write_text(DOC)
    splice_section(md, "## Decade stress", "## Decade stress\n\nnew table\n")
    out = md.read_text()
    assert "| a | b |" not in out and "new table" in out
    assert "## Streaming state scale under RocksDB\n" in out
    assert "decomposition table — the r8 casualty" in out


def test_guard_rejects_body_containing_heading(tmp_path):
    """A body smuggling an END_MARKS heading would shrink the section on
    the NEXT splice — the guard must refuse to write it."""
    md = tmp_path / "SCALING.md"
    md.write_text(DOC)
    mark = "## Streaming state scale under RocksDB"
    with pytest.raises(RuntimeError):
        splice_section(md, mark, mark + "\n\n### smuggled heading\n\nx\n")
    assert md.read_text() == DOC  # nothing written


def test_body_must_start_with_marker(tmp_path):
    md = tmp_path / "SCALING.md"
    md.write_text(DOC)
    with pytest.raises(ValueError):
        splice_section(md, "## Decade stress", "not the marker\n")
    assert md.read_text() == DOC


def test_marker_quoted_in_prose_is_not_a_match(tmp_path):
    """ADVICE r9: a marker string quoted mid-line in earlier prose must
    not anchor the splice — only a line-start occurrence counts."""
    md = tmp_path / "SCALING.md"
    md.write_text(
        "# Title\n"
        "\n"
        "prose that quotes ## Decade stress mid-line\n"
        "\n"
        "## Decade stress\n"
        "\n"
        "old table\n"
    )
    splice_section(md, "## Decade stress", "## Decade stress\n\nnew table\n")
    out = md.read_text()
    assert out.startswith(
        "# Title\n\nprose that quotes ## Decade stress mid-line\n\n"
    )
    assert "old table" not in out and "new table" in out


def test_heading_inside_fence_is_not_a_boundary(tmp_path):
    """A `## `-looking line inside a fenced code block is content, not a
    section boundary — the splice must span past it."""
    doc = (
        "# Title\n"
        "\n"
        "## A\n"
        "\n"
        "```\n"
        "## not a heading\n"
        "```\n"
        "\n"
        "still section A\n"
        "\n"
        "## B\n"
        "\n"
        "b body\n"
    )
    md = tmp_path / "SCALING.md"
    md.write_text(doc)
    splice_section(md, "## A", "## A\n\nreplaced\n")
    out = md.read_text()
    assert "not a heading" not in out and "still section A" not in out
    assert out.endswith("## B\n\nb body\n")


def test_duplicate_line_start_marker_raises(tmp_path):
    """Two line-start occurrences of the marker are ambiguous — refuse
    rather than splice the first silently."""
    doc = "# Title\n\n## Dup\n\none\n\n## Dup\n\ntwo\n"
    md = tmp_path / "SCALING.md"
    md.write_text(doc)
    with pytest.raises(RuntimeError):
        splice_section(md, "## Dup", "## Dup\n\nnew\n")
    assert md.read_text() == doc  # nothing written


def test_trailing_h4_section_preserved(tmp_path):
    """The r8 failure class one heading level over: a trailing ####-level
    section after the marker must survive the splice."""
    doc = "# Title\n\n## S\n\nold\n\n#### deep trailing\n\nkeep me\n"
    md = tmp_path / "SCALING.md"
    md.write_text(doc)
    splice_section(md, "## S", "## S\n\nnew\n")
    out = md.read_text()
    assert "old" not in out and "new" in out
    assert out.endswith("#### deep trailing\n\nkeep me\n")
