"""Category / heading-variant / question configuration.

Mirrors the reference's broadcast config maps:
- category -> extraction question: /root/reference/config/question_mapping.json:1-7
- category -> heading variants:    /root/reference/config/heading_mapping.json:1-35

These are tiny dimensions; in Spark they become broadcast joins or literal
``create_map`` columns (SURVEY.md §2.3 "Broadcast-map lookup").
"""

from __future__ import annotations

# The six fact categories (predicates) the reference extracts.
CATEGORIES: tuple[str, ...] = (
    "project_proponents",
    "ghg_emission_reductions",
    "methodology",
    "project_location",
    "crediting_period",
    "sector",
)

# category -> lowercase heading variants (contains-match against heading titles),
# semantics of config/heading_mapping.json + context_extractor.py:78-81.
HEADING_VARIANTS: dict[str, list[str]] = {
    "project_proponents": ["project proponent", "participants"],
    "ghg_emission_reductions": [
        "estimated ghg emission reduction",
        "estimated amount of emission reduction",
    ],
    "methodology": ["methodology", "methodologies"],
    "project_location": [
        "project location",
        "location of project",
        "location of the project",
        "project zone map",
    ],
    "crediting_period": ["crediting period", "credit period"],
    "sector": [
        "project type",
        "type of project",
        "sectoral scope",
        "sectorial scope",
        "sector scope",
        "category of the project",
    ],
}

# category -> question (run_pipeline.py:37 maps category->question before prompt
# assembly; our extractor is schema-guided so the question is metadata/lineage).
QUESTION_MAPPING: dict[str, str] = {
    "project_proponents": (
        "What are the project proponents, including organization name, phone "
        "number, email address, state/city and country?"
    ),
    "methodology": "What are the methodologies of this project?",
    "project_location": (
        "What are the project city, country, latitude, and longitude of this project?"
    ),
    "crediting_period": (
        "What are the start and end dates of the crediting period for this project?"
    ),
    "sector": (
        "What is the project sector, either Renewable Energy or Forestry and Land Use?"
    ),
    "ghg_emission_reductions": (
        "Get all the yearly Estimated GHG Emission Reductions or Removals records."
    ),
}

# Valid methodology codes — the semi-join dimension
# (ground_truth_project_detail_formatter.py:110,178-179 validates codes against a
# CDM list). A small deterministic pool for fixtures and the broadcast dim.
METHODOLOGY_CODES: tuple[str, ...] = (
    "ACM0002",
    "ACM0018",
    "AMS-I.D.",
    "AMS-III.D.",
    "AM0029",
    "VM0007",
    "VM0015",
    "AR-ACM0003",
)

# City/country gazetteer — the flashgeotext dictionary mirror
# (ground_truth_project_detail_formatter.py:47-49,170-171). Broadcast into the
# Aho-Corasick batch scan (kgx.gazetteer) for free-text location mentions.
GAZETTEER_CITIES: tuple[str, ...] = (
    "Lima", "Nairobi", "Jakarta", "Hanoi", "Madrid", "Bucharest",
    "Portland", "Austin", "Denver", "Seattle",
)
GAZETTEER_COUNTRIES: tuple[str, ...] = (
    "Peru", "Kenya", "Indonesia", "Vietnam", "Spain", "Romania",
    "United States", "Brazil", "India",
)

# US state abbreviation -> full name (subset), mirroring the `us` package usage
# at ground_truth_project_detail_formatter.py:52-56,173-175.
US_STATE_ABBR: dict[str, str] = {
    "CA": "California",
    "TX": "Texas",
    "NY": "New York",
    "WA": "Washington",
    "OR": "Oregon",
    "CO": "Colorado",
}
