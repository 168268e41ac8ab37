"""Deterministic synthetic `pages` corpus + golden outputs (FIXTURES.md).

The generator is seeded pure Python, so the golden single-process extractor and
the Spark pipeline see identical bytes. The golden extractor below is the
*reference-semantics* implementation (sequential, per-document — the shape of
scripts/run_pipeline.py + context_extractor.py in /root/reference) against which
the Spark pipeline is scored at P/R >= 0.95 (BASELINE.json:north_rule).

Schema (BASELINE.json:input_hint): pages(url string, warc_ts timestamp,
html binary, text string, lang string).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from kgx import kernel
from kgx.config import (
    CATEGORIES,
    GAZETTEER_CITIES,
    GAZETTEER_COUNTRIES,
    METHODOLOGY_CODES,
    US_STATE_ABBR,
)

SEED = 42
# bump when gen_pages output OR the parquet layout changes — cached bench
# corpora under /tmp are keyed by (n, FIXTURE_VERSION) so stale generations
# (v2's single-row-group small corpora) can't leak into numbers
FIXTURE_VERSION = 3

# --------------------------------------------------------------------------- #
# entity pools (FIXTURES.md §2)
# --------------------------------------------------------------------------- #

# Each org appears under several surface variants (casing/punct/abbrev noise) so
# MinHash-LSH blocking + connected-components has real work
# (mirrors PDD_categorization.py:46-74 grouping semantics).
ORGS: list[dict] = [
    {"org_id": f"org:{i:03d}", "name": base, "variants": variants}
    for i, (base, variants) in enumerate(
        [
            ("Acme Renewables", ["Acme Renewables Ltd", "Acme Renewables Ltd.",
                                 "ACME Renewables Limited", "Acme Renewables"]),
            ("Verdant Forestry Group", ["Verdant Forestry Group", "Verdant Forestry Group Inc",
                                        "VERDANT FORESTRY GROUP, INC."]),
            ("Solaris Energia", ["Solaris Energia", "Solaris Energia S.A.",
                                 "Solaris Energia SA"]),
            ("Blue River Hydro", ["Blue River Hydro", "Blue River Hydro Co.",
                                  "Blue River Hydro Company"]),
            ("Green Horizon Carbon", ["Green Horizon Carbon", "Green Horizon Carbon LLC",
                                      "GREEN HORIZON CARBON L.L.C."]),
            ("Terra Verde Projects", ["Terra Verde Projects", "Terra Verde Projects Ltda",
                                      "Terra Verde Projects LTDA."]),
            ("Windward Power Partners", ["Windward Power Partners", "Windward Power Partners LP",
                                         "Windward Power Partners, L.P."]),
            ("Savanna Restoration Trust", ["Savanna Restoration Trust",
                                           "Savanna Restoration Trust (SRT)",
                                           "SAVANNA RESTORATION TRUST"]),
            ("Pacific Biochar", ["Pacific Biochar", "Pacific Biochar Inc.",
                                 "Pacific Biochar Incorporated"]),
            ("Andes Cookstoves", ["Andes Cookstoves", "Andes Cookstoves SAC",
                                  "Andes Cookstoves S.A.C."]),
            ("Mangrove Blue Carbon", ["Mangrove Blue Carbon", "Mangrove Blue Carbon Ltd",
                                      "MANGROVE BLUE CARBON LTD."]),
            ("Highland Afforestation", ["Highland Afforestation", "Highland Afforestation Plc",
                                        "Highland Afforestation PLC"]),
        ]
    )
]

CITIES = list(GAZETTEER_CITIES)
COUNTRIES = list(GAZETTEER_COUNTRIES)
STATES = ["California", "Texas", "New York", "Washington", "Oregon", "Colorado",
          "Cusco", "Rift Valley", "West Java", "Lam Dong"]
# an invalid-but-well-formed code that must be dropped by the semi-join validation
INVALID_CODE = "ACM9999"

HOT_DOMAINS = ["hot.example.org", "big.example.net"]  # skew targets (FIXTURES.md §1)

_BOILER_NAV = (
    "<nav><ul><li>Home</li><li>Registry</li><li>Search projects</li>"
    "<li>Login</li></ul></nav>"
)
_BOILER_FOOTER = (
    "<footer><p>Copyright 2024 Example Registry. All rights reserved. "
    "Terms of use | Privacy policy</p></footer>"
)

_FILLER_WORDS = (
    "baseline monitoring additionality leakage permanence verification "
    "stakeholder consultation emission scenario boundary quantification "
    "conservative approach sampling uncertainty parameter default factor"
).split()


def _filler(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_FILLER_WORDS) for _ in range(n_words))


def _date_str(rng: random.Random, d: datetime) -> str:
    """Render a date in one of the two reference formats
    (ground_truth_project_detail_formatter.py:159-165)."""
    if rng.random() < 0.5:
        return d.strftime("%d/%m/%Y")
    # platform-independent non-zero-padded day
    return f"{d.strftime('%B')} {d.day}, {d.year}"


def gen_pages(n: int = 200, seed: int = SEED) -> list[dict]:
    """Deterministic pages rows: url, warc_ts, html (bytes), text, lang.

    `text` is the golden boilerplate-stripped extraction of `html` computed with
    the shared kernel (the byte-identical-per-url target).
    """
    rng = random.Random(seed)
    base_ts = datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        # ~5% of rows on a few hot domains (skew/salting tests)
        if rng.random() < 0.05:
            domain = rng.choice(HOT_DOMAINS)
        else:
            domain = f"d{i % 97:02d}.example.com"
        url = f"https://{domain}/proj/{i:06d}"
        lang = "en" if rng.random() < 0.92 else rng.choice(["ro", "es"])

        org = rng.choice(ORGS)
        variant = rng.choice(org["variants"])
        second_org = rng.choice(ORGS) if rng.random() < 0.3 else None
        second_variant = rng.choice(second_org["variants"]) if second_org else None

        city = rng.choice(CITIES)
        country = rng.choice(COUNTRIES)
        state = rng.choice(STATES)
        # sometimes write the US-state abbreviation; extraction canonicalizes it
        if state in US_STATE_ABBR.values() and rng.random() < 0.4:
            state_written = {v: k for k, v in US_STATE_ABBR.items()}[state]
        else:
            state_written = state
        lat = round(rng.uniform(-30, 50), 4)
        lon = round(rng.uniform(-120, 120), 4)

        codes = sorted(rng.sample(METHODOLOGY_CODES, rng.choice([1, 1, 2])))
        codes_written = list(codes)
        if rng.random() < 0.15:
            codes_written.append(INVALID_CODE)  # dropped by semi-join validation
        rng.shuffle(codes_written)

        start = datetime(2018 + rng.randrange(4), 1 + rng.randrange(12), 1 + rng.randrange(28))
        end = start + timedelta(days=365 * rng.choice([7, 10, 20]))
        sector_is_forestry = rng.random() < 0.5

        year0 = 2019 + rng.randrange(3)
        ghg_rows = []
        for y in range(year0, year0 + rng.choice([3, 5, 8])):
            if rng.random() < 0.1:
                v = 0.0  # zero rows are excluded downstream
            elif rng.random() < 0.1:
                v = -round(rng.uniform(1, 500), 3)  # negative removals exist
            else:
                v = round(rng.uniform(100, 99999), 3)
            ghg_rows.append((y, f"{v:.3f}"))

        # which sections this page has (some categories missing at random)
        present = {c: rng.random() < 0.9 for c in CATEGORIES}

        body: list[str] = []
        body.append("<h1>1. PROJECT DETAILS</h1>")
        body.append(f"<p>{_filler(rng, 12)}.</p>")
        if lang != "en":
            # non-English page: headings don't match English variants -> no facts
            body.append("<h2>1.1 DESCRIEREA PROIECTULUI</h2>")
            body.append(f"<p>{_filler(rng, 40)}.</p>")
        else:
            sub = 0  # sequential subsection numbering (validated hierarchically)
            if present["project_proponents"]:
                sub += 1
                body.append(f"<h2>1.{sub} PROJECT PROPONENT (S)</h2>")
                blocks = [(variant, org)] + (
                    [(second_variant, second_org)] if second_org else []
                )
                for v, o in blocks:
                    slug = o["name"].lower().replace(" ", "")
                    phone = f"+1-555-0{int(o['org_id'][4:]):03d}"
                    if rng.random() < 0.35:
                        # unlabeled block: contact details live in free text —
                        # exercised by the CommonRegex-style phone/email
                        # mention extraction + the city/country gazetteer scan
                        body.append(
                            f"<p>Organization Name: {v}</p>"
                            f"<p>Based in {rng.choice(CITIES)}, "
                            f"{rng.choice(COUNTRIES)}. Reach us at {phone} "
                            f"or contact@{slug}.example for details.</p>"
                        )
                    else:
                        body.append(
                            f"<p>Organization Name: {v}</p>"
                            f"<p>Telephone: {phone}</p>"
                            f"<p>Email: contact@{slug}.example</p>"
                            f"<p>City: {rng.choice(CITIES)}</p>"
                            f"<p>Country: {rng.choice(COUNTRIES)}</p>"
                        )
            if present["sector"]:
                sub += 1
                body.append(f"<h2>1.{sub} SECTORAL SCOPE AND TYPE OF PROJECT</h2>")
                if sector_is_forestry:
                    body.append(f"<p>The project is a forestry and land restoration "
                                f"activity. {_filler(rng, 10)}.</p>")
                else:
                    body.append(f"<p>The project is a renewable energy generation "
                                f"activity. {_filler(rng, 10)}.</p>")
            if present["project_location"]:
                sub += 1
                body.append(f"<h2>1.{sub} PROJECT LOCATION</h2>")
                body.append(
                    f"<p>The project is located in {state_written}, {country} "
                    f"at latitude {lat:.4f} and longitude {lon:.4f}. "
                    f"{_filler(rng, 8)}.</p>"
                )
            if present["methodology"]:
                sub += 1
                body.append(f"<h2>1.{sub} METHODOLOGY APPLIED</h2>")
                body.append(
                    f"<p>The project applies the approved methodologies "
                    f"{' and '.join(codes_written)} under the program. "
                    f"{_filler(rng, 8)}.</p>"
                )
            if present["crediting_period"]:
                sub += 1
                body.append(f"<h2>1.{sub} CREDITING PERIOD OF THE PROJECT</h2>")
                body.append(
                    f"<p>The crediting period runs from {_date_str(rng, start)} "
                    f"to {_date_str(rng, end)} (renewable).</p>"
                )
            # a false heading: ' MW ' exclusion (PDFExtraction.py:55-58)
            body.append(f"<p>2.5 MW CAPACITY</p><p>{_filler(rng, 10)}.</p>")
            if present["ghg_emission_reductions"]:
                body.append("<h1>2. ESTIMATED GHG EMISSION REDUCTIONS</h1>")
                tbl = ["<table><tr><th>Year</th><th>Estimated ER (tCO2e)</th></tr>"]
                for y, v in ghg_rows:
                    tbl.append(f"<tr><td>{y}</td><td>{v}</td></tr>")
                tbl.append("</table>")
                body.append("".join(tbl))
            body.append("<h2>2.1 BASELINE SCENARIO</h2>")
            pad = 60 if rng.random() < 0.8 else 600  # some multi-chunk sections
            body.append(f"<p>{_filler(rng, pad)}.</p>")
            # an out-of-sequence heading dropped by hierarchical validation
            # (PDFExtraction.py:76-149)
            body.append(f"<p>5.7 UNRELATED ANNEX</p><p>{_filler(rng, 8)}.</p>")
            # a ToC-artifact dotted line (PDFExtraction.py:44-48)
            body.append("<p>1.2 SECTORAL SCOPE ...................... 4</p>")

        html = (
            f"<html><head><title>Project {i:06d}</title>"
            f"<style>body {{font: serif}}</style></head><body>"
            f"{_BOILER_NAV}<main>{''.join(body)}</main>{_BOILER_FOOTER}"
            f"</body></html>"
        )
        html_b = html.encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + timedelta(minutes=i),
                "html": html_b,
                "text": kernel.html_to_text(html_b),
                "lang": lang,
            }
        )
    return rows


# --------------------------------------------------------------------------- #
# golden (single-process, reference-semantics) outputs
# --------------------------------------------------------------------------- #

def golden_sections(pages: list[dict]) -> list[dict]:
    out = []
    for p in pages:
        for s in kernel.sections_from_text(p["text"]):
            out.append(
                {
                    "url": p["url"],
                    "section": s["section"],
                    "start_off": s["start_off"],
                    "end_off": s["end_off"],
                    "category": kernel.categorize_heading(s["title"]),
                }
            )
    return out


def golden_contexts(pages: list[dict]) -> list[dict]:
    """Long-format (url, category, context) — context_extractor.py:146-153."""
    out = []
    for p in pages:
        for s in kernel.sections_from_text(p["text"]):
            cat = kernel.categorize_heading(s["title"])
            if cat is None:
                continue
            body = p["text"][s["body_off"] : s["end_off"]].strip()
            out.append(
                {
                    "url": p["url"],
                    "category": cat,
                    "context": kernel.select_context(body, cat),
                }
            )
    return out


def golden_contexts_refined(
    pages: list[dict], mode: str = "best1", threshold: float = 0.95
) -> list[dict]:
    """Reference compression pipeline goldens (context_extractor.py:132-146):
    mode='redundant' -> EmbeddingsRedundantFilter survivors re-joined;
    mode='best1' -> redundancy drop + EmbeddingsFilter(k=1)."""
    fn = {
        "redundant": kernel.select_context_redundant,
        "best1": kernel.select_context_best1,
    }[mode]
    out = []
    for p in pages:
        for s in kernel.sections_from_text(p["text"]):
            cat = kernel.categorize_heading(s["title"])
            if cat is None:
                continue
            body = p["text"][s["body_off"] : s["end_off"]].strip()
            out.append(
                {"url": p["url"], "category": cat,
                 "context": fn(body, cat, threshold=threshold)}
            )
    return out


def _canon_groups(pages: list[dict]) -> dict[str, str]:
    """surface -> representative for all org surfaces appearing in the corpus.

    Golden canonicalization: group = the true org (pool identity); representative
    = lexicographically smallest (normalized, raw) surface appearing in the
    corpus. The Spark path must recover the same grouping via MinHash-LSH
    blocking + exact-Jaccard verification + connected components.
    """
    appearing: dict[str, set[str]] = {}
    for c in golden_contexts(pages):
        if c["category"] != "project_proponents":
            continue
        props = kernel.extract_proponents(c["context"]) or []
        for pr in props:
            name = pr["organization_name"]
            for o in ORGS:
                if name in o["variants"]:
                    appearing.setdefault(o["org_id"], set()).add(name)
                    break
    mapping: dict[str, str] = {}
    for surfaces in appearing.values():
        rep = min(surfaces, key=lambda v: (kernel.normalize_surface(v), v))
        for s in surfaces:
            mapping[s] = rep
    return mapping


def golden_entities(pages: list[dict]) -> list[dict]:
    return [
        {"surface": s, "canonical": rep} for s, rep in sorted(_canon_groups(pages).items())
    ]


def golden_triples(pages: list[dict]) -> list[dict]:
    """Reference-semantics triples with canonicalized proponent org names."""
    mapping = _canon_groups(pages)
    valid_codes = set(METHODOLOGY_CODES)
    out = []
    for p in pages:
        subj = kernel.page_id_from_url(p["url"])
        for cat, fact in kernel.page_facts(p["text"]):
            if cat == "methodology":
                fact = [c for c in fact if c in valid_codes]
                if not fact:
                    continue
            if cat == "project_proponents":
                fact = [
                    {**pr, "organization_name": mapping.get(
                        pr["organization_name"], pr["organization_name"])}
                    for pr in fact
                ]
            out.append(
                {
                    "subj": subj,
                    "pred": cat,
                    "obj": kernel.canonical_json(fact),
                    "src_url": p["url"],
                }
            )
    return out


def _pages_table(pages: list[dict]):
    import pyarrow as pa

    return pa.table(
        {
            "url": [p["url"] for p in pages],
            "warc_ts": pa.array([p["warc_ts"] for p in pages], pa.timestamp("us")),
            "html": pa.array([p["html"] for p in pages], pa.binary()),
            "text": [p["text"] for p in pages],
            "lang": [p["lang"] for p in pages],
        }
    )


def row_group_size(n: int) -> int:
    """Parquet row-group rows for an n-page corpus: >=16 scan splits for small
    corpora, capped at 4096 (metadata overhead dominates below ~256 rows/group
    on multi-KB rows at the 1M scale)."""
    return min(4096, max(64, -(-n // 16)))


def write_fixture(
    out_dir: str, n: int = 200, seed: int = SEED, golden: bool = True
) -> None:
    """Write pages.parquet (+ golden_*.parquet) with pyarrow (no Spark needed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages = gen_pages(n, seed)
    # Spark's scan-time splitting (maxPartitionBytes) can only parallelize
    # across row-group boundaries — one giant group = one task. 4096 is right
    # for ~6KB rows at 1M pages (256 made that scan metadata-bound), but a
    # fixed 4096 left the 4000-page bench corpus as a SINGLE group and
    # serialized the whole extract stage (the r2 kg_pipeline "regression").
    # Scale the group size to the corpus so small corpora still split >=16 ways.
    pq.write_table(
        _pages_table(pages), f"{out_dir}/pages.parquet", row_group_size=row_group_size(n)
    )
    if not golden:
        return
    for name, rows in (
        ("golden_sections", golden_sections(pages)),
        ("golden_contexts", golden_contexts(pages)),
        ("golden_entities", golden_entities(pages)),
        ("golden_triples", golden_triples(pages)),
    ):
        if rows:
            cols = {k: [r[k] for r in rows] for k in rows[0]}
            pq.write_table(pa.table(cols), f"{out_dir}/{name}.parquet")


def write_pages_chunked(
    out_dir: str, n: int, seed: int = SEED, chunk: int = 50_000
) -> None:
    """Large bench corpora: stream pages to one parquet file in row groups so
    memory stays bounded (no golden tables at this scale)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    writer = None
    # chunks must reproduce gen_pages(n, seed) exactly: a single RNG stream
    rng_pages = gen_pages(n, seed)  # generation itself is the memory bound;
    # rows are handed to arrow in slices so the arrow buffers stay chunked
    try:
        for i in range(0, n, chunk):
            t = _pages_table(rng_pages[i : i + chunk])
            if writer is None:
                writer = pq.ParquetWriter(f"{out_dir}/pages.parquet", t.schema)
            writer.write_table(t, row_group_size=row_group_size(n))
    finally:
        if writer is not None:
            writer.close()
