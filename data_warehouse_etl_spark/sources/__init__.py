from .feeds import (
    export_xml_feed,
    flatten_json_column,
    parse_xml_feed_udf,
    read_weekly_csv,
    render_xml_feed_udf,
)

__all__ = ["read_weekly_csv", "flatten_json_column", "parse_xml_feed_udf"]
