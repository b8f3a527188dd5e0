"""PAGE-XML-style serialization (S4 analog of writer.py:142-248).

The reference serializes regions/lines/reading order into PAGE-XML
documents. Here the same tree shape is built **entirely in Catalyst**
(sort_array + transform + concat_ws + format_string + escape chain) —
one aggregation per page, no UDFs — so serialization scales exactly
like any other aggregation and has an ANSI-SQL oracle.

Region ids use the reference's counter format (region_%04d,
utils/counter.py:3-4); the ReadingOrder block mirrors
RegionRefIndexed (utils/xml.py:32-60).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _xml_escape(col):
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def regions_to_pagexml(
    regions: DataFrame,
    page_keys: list[str],
    region_id_col: str = "region_id",
    order_col: str = "reading_order",
    type_col: str = "label",
    text_col: str = "region_text",
) -> DataFrame:
    """One XML document string per page from a region-level frame.

    Output: page_keys... , page_xml STRING.
    """
    region_xml = F.format_string(
        '<TextRegion id="%s" type="%s"><TextEquiv>%s</TextEquiv></TextRegion>',
        F.col(region_id_col),
        F.col(type_col),
        _xml_escape(F.col(text_col)),
    )
    ref_xml = F.format_string(
        '<RegionRefIndexed index="%d" regionRef="%s"/>',
        F.col(order_col),
        F.col(region_id_col),
    )
    per_region = regions.select(
        *page_keys,
        F.struct(F.col(order_col).alias("o"), region_xml.alias("rx"), ref_xml.alias("fx")).alias("r"),
    )
    agg = per_region.groupBy(*page_keys).agg(
        F.array_sort(F.collect_list("r")).alias("rs")
    )
    body = F.concat_ws("", F.transform("rs", lambda r: r["rx"]))
    order = F.concat_ws("", F.transform("rs", lambda r: r["fx"]))
    return agg.select(
        *page_keys,
        F.concat(
            F.lit("<Page>"),
            F.lit("<ReadingOrder><OrderedGroup>"),
            order,
            F.lit("</OrderedGroup></ReadingOrder>"),
            body,
            F.lit("</Page>"),
        ).alias("page_xml"),
    )
