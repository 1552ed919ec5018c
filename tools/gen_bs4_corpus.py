"""(Re)generate tests/fixtures/bs4_corpus.json - the committed corpus
of (malformed page, expected anchor hrefs) pairs that
tests/test_pipeline.py replays against the stdlib extraction WITHOUT
importing bs4.

Why a committed corpus: the reference parses pages with
BeautifulSoup(page, 'html.parser')
(data-downloader/data_downloader.py:84-91), and the property test
proving our stdlib fallback matches bs4 can only run where bs4 is
importable - which this build environment is not. The corpus bridges
that: pages are generated DETERMINISTICALLY (fixed seed, stdlib
random) from the same malformed-markup grammar the live property test
uses, and expectations are computed by

- REAL BeautifulSoup when importable (``oracle: bs4-<version>``) -
  run this script anywhere bs4 exists to re-derive ground truth; any
  diff from the committed file is a genuine fidelity bug;
- otherwise the documented-semantics model below
  (``oracle: semantics-model``): stdlib HTMLParser (the exact
  tokenizer bs4's html.parser builder wraps) plus bs4's attribute
  layer - ``value or ''`` for minimized attributes, last-wins dict
  build for duplicates (default on_duplicate_attribute=REPLACE),
  ``find_all('a', href=True)`` matching any non-None value.

The JSON records which oracle produced it, so a reviewer can tell
replayed-bs4 ground truth from the model's claim at a glance.

Usage: python tools/gen_bs4_corpus.py  (writes the fixture in place)
"""

from __future__ import annotations

import json
import os
import random

SEED = 20260814
N_PAGES = 400
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "bs4_corpus.json"
)

_URL_ALPHABET = "abcz0123456789/._-:"
_NOISE_ALPHABET = "xy <>&\"'="


def _url(rng: random.Random) -> str:
    return "".join(
        rng.choice(_URL_ALPHABET) for _ in range(rng.randint(1, 16))
    )


def _noise(rng: random.Random) -> str:
    return "".join(
        rng.choice(_NOISE_ALPHABET) for _ in range(rng.randint(0, 8))
    )


def _fragment(rng: random.Random) -> str:
    u = _url(rng)
    shapes = [
        f'<a href="{u}">t</a>',
        f"<a href='{u}'>t</a>",
        f"<a href={u}>t</a>",
        f'<A HREF = "{u}">T</A>',
        f'<a class="c" href={u} rel=nofollow>t</a>',
        f'<a data-href="{u}">decoy</a>',
        f'<!-- <a href="{u}">hidden</a> -->',
        f'<![CDATA[ <a href="{u}">c</a> ]]>',
        f'<a href="{u}>unclosed quote</a>',
        f"<div <span>> <a href={u}>nested</a>",
        f"<p>{_noise(rng)}</p>",
        "<a>no href</a>",
        # attribute-layer corners: minimized href, duplicated href
        "<a href>bare</a>",
        f'<a href="{u}" href="{_url(rng)}">dup</a>',
        f"<a href href={u}>bare-then-value</a>",
    ]
    return rng.choice(shapes)


def gen_pages() -> list[str]:
    rng = random.Random(SEED)
    pages = []
    for _ in range(N_PAGES):
        n = rng.randint(0, 10)
        body = "".join(_fragment(rng) for _ in range(n))
        pages.append(f"<html><body>{body}</body></html>")
    return pages


def model_hrefs(page: str) -> list[str]:
    """The documented-semantics model of
    BeautifulSoup(page, 'html.parser').find_all('a', href=True):
    stdlib tokenizer events + bs4's attribute-dict build."""
    from html.parser import HTMLParser

    out: list[str] = []

    class _Anchors(HTMLParser):
        def handle_starttag(self, tag, attrs):  # noqa: ANN001
            if tag != "a":
                return
            d: dict = {}
            for k, v in attrs:
                d[k] = v or ""  # minimized -> ''; duplicate -> last wins
            if "href" in d:  # href=True matches any non-None value
                out.append(d["href"])

    p = _Anchors(convert_charrefs=True)
    p.feed(page)
    p.close()
    return out


def main() -> int:
    try:
        import bs4
        from bs4 import BeautifulSoup

        def oracle_fn(page: str) -> list[str]:
            return [
                a["href"]
                for a in BeautifulSoup(page, "html.parser").find_all(
                    "a", href=True
                )
            ]

        oracle = f"bs4-{bs4.__version__}"
    except ImportError:
        oracle_fn = model_hrefs
        oracle = "semantics-model"

    pages = gen_pages()
    corpus = {
        "seed": SEED,
        "oracle": oracle,
        "entries": [
            {"page": p, "hrefs": oracle_fn(p)} for p in pages
        ],
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(corpus, f, indent=1)
    n_hrefs = sum(len(e["hrefs"]) for e in corpus["entries"])
    print(f"wrote {OUT}: {len(pages)} pages, {n_hrefs} hrefs, oracle={oracle}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
