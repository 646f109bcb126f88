"""Typeset ALGORITHMS.md into a paginated PDF (ALGORITHMS.pdf).

The reference ships a built pseudocode paper (`/root/reference/pc.tex`
+ `pc.pdf`). Our algorithmic documentation lives in ALGORITHMS.md; this
builder produces the corresponding BUILT artifact without a LaTeX
toolchain (none in the image): a simple two-weight typeset — serif body,
monospace for code spans/blocks, bold headings — rendered page by page
with matplotlib (DejaVu covers the math glyphs ‖·‖, θ, Σ, ∈, ×, ⁻¹).

Usage: python tools/build_paper.py [src.md] [out.pdf]
"""
from __future__ import annotations

import re
import sys
import textwrap

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.backends.backend_pdf import PdfPages

PAGE_W, PAGE_H = 8.27, 11.69          # A4 inches
MARGIN_X, MARGIN_Y = 0.9, 0.8
BODY_SIZE = 9.5
LINE_H = 0.165                        # inches per body line
WRAP = 88                             # body wrap columns
WRAP_CODE = 84


def _wrap(text: str, width: int, indent: str = "") -> list[str]:
    if not text.strip():
        return [""]
    return textwrap.wrap(
        text, width=width, initial_indent=indent, subsequent_indent=indent,
        break_long_words=False, break_on_hyphens=False,
    ) or [""]


def parse(md: str):
    """Markdown -> list of (kind, text) lines; kind drives the typeface."""
    out = []
    in_code = False
    for raw in md.splitlines():
        if raw.strip().startswith("```"):
            in_code = not in_code
            continue
        if in_code:
            out.append(("code", raw.rstrip()))
            continue
        s = raw.rstrip()
        if s.startswith("# "):
            out.append(("h1", s[2:]))
        elif s.startswith("## "):
            out.append(("h2", s[3:]))
        elif s.startswith("### "):
            out.append(("h3", s[4:]))
        elif s.strip() == "---":
            out.append(("rule", ""))
        elif s.startswith(("* ", "- ")):
            for i, w in enumerate(_wrap(s[2:], WRAP - 4)):
                out.append(("body", ("  • " if i == 0 else "    ") + w))
        elif s.startswith("  "):
            for w in _wrap(s.strip(), WRAP - 2, indent="  "):
                out.append(("body", w))
        else:
            for w in _wrap(s, WRAP):
                out.append(("body", w))
    return out


STYLE = {
    "h1": dict(size=15, weight="bold", family="serif", pad=2.2),
    "h2": dict(size=11.5, weight="bold", family="serif", pad=1.8),
    "h3": dict(size=10, weight="bold", family="serif", pad=1.4),
    "body": dict(size=BODY_SIZE, weight="normal", family="serif", pad=1.0),
    "code": dict(size=8, weight="normal", family="monospace", pad=1.0),
}

# inline `code` spans render whole-line serif with the backticks stripped
# (matplotlib has no inline font switching without mathtext round trips)
_TICKS = re.compile(r"`([^`]*)`")
_BOLD = re.compile(r"\*\*([^*]+)\*\*")


def _plain(text: str) -> str:
    return _BOLD.sub(r"\1", _TICKS.sub(r"\1", text))


def build(src: str, dst: str) -> int:
    lines = parse(open(src, encoding="utf-8").read())
    usable = PAGE_H - 2 * MARGIN_Y
    pages = 0
    with PdfPages(dst) as pdf:
        i = 0
        while i < len(lines):
            fig = plt.figure(figsize=(PAGE_W, PAGE_H))
            ax = fig.add_axes([0, 0, 1, 1])
            ax.axis("off")
            y = PAGE_H - MARGIN_Y
            while i < len(lines):
                kind, text = lines[i]
                if kind == "rule":
                    y -= LINE_H * 0.6
                    ax.plot([MARGIN_X / PAGE_W, 1 - MARGIN_X / PAGE_W],
                            [y / PAGE_H] * 2, lw=0.5, color="0.6")
                    y -= LINE_H * 0.6
                    i += 1
                    continue
                st = STYLE[kind]
                need = LINE_H * st["pad"]
                if y - need < MARGIN_Y:
                    break
                y -= need
                ax.text(MARGIN_X / PAGE_W, y / PAGE_H,
                        _plain(text),
                        transform=ax.transAxes, fontsize=st["size"],
                        fontweight=st["weight"], family=st["family"],
                        va="bottom", ha="left")
                i += 1
            pages += 1
            ax.text(0.5, MARGIN_Y * 0.4 / PAGE_H, str(pages),
                    transform=ax.transAxes, fontsize=8, ha="center",
                    family="serif", color="0.4")
            pdf.savefig(fig)
            plt.close(fig)
    return pages


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "ALGORITHMS.md"
    dst = sys.argv[2] if len(sys.argv) > 2 else "ALGORITHMS.pdf"
    n = build(src, dst)
    print(f"{dst}: {n} pages")
