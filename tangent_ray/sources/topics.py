"""NTCIR topics-XML query reader (reference S5 parity).

The reference reads NTCIR math-task topic files with BeautifulSoup and
emits one query document per ``<topic>`` — its ``<num>`` plus the
formula MathML and keyword strings concatenated (``query.py:96-114``,
``runquery.py:109-127``). This reader produces the same surface as a
query table for :class:`tangent_ray.query.scorer.QueryScorer`: the
``<math>`` spans ride VERBATIM in the query text (the scorer's
``parse_query`` finds them with ``MATHML_SPAN_RE`` and converts through
the MathML front end), keywords become plain text terms.

Regex-extraction is deliberate (like the reference's soup-find over raw
markup): topic files mix namespace prefixes (``m:math``) and XML
re-serialization would perturb the span bytes the scorer caches on.
Driver-side and tiny by contract — topic sets are 40-100 queries.
"""

from __future__ import annotations

import re

import pyarrow as pa

_TOPIC_RE = re.compile(r"<topic>(.*?)</topic>", re.DOTALL)
_NUM_RE = re.compile(r"<num>\s*(.*?)\s*</num>", re.DOTALL)
_KEYWORD_RE = re.compile(r"<keyword[^>]*>(.*?)</keyword>", re.DOTALL)

QUERY_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
    ]
)


def read_topics(xml_path: str) -> pa.Table:
    """Parse an NTCIR topics file into a (query_id, kind, text) table.

    ``kind`` is "math" for formula-only topics and "mixed" when the topic
    also carries keywords — the same math/text fusion split the scorer's
    ``kind`` column drives."""
    from tangent_ray.tokenize.mathml import MATHML_SPAN_RE

    with open(xml_path, encoding="utf-8") as f:
        src = f.read()
    qids: list[str] = []
    kinds: list[str] = []
    texts: list[str] = []
    for m in _TOPIC_RE.finditer(src):
        body = m.group(1)
        num = _NUM_RE.search(body)
        if num is None:
            continue
        maths = MATHML_SPAN_RE.findall(body)
        keywords = [k.strip() for k in _KEYWORD_RE.findall(body) if k.strip()]
        if not maths and not keywords:
            continue
        qids.append(num.group(1))
        kinds.append("mixed" if (maths and keywords) else
                     ("math" if maths else "text"))
        texts.append(" ".join(maths + keywords))
    return pa.Table.from_arrays(
        [
            pa.array(qids, pa.string()),
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
        ],
        schema=QUERY_SCHEMA,
    )
