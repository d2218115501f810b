from .feeds import read_weekly_csv, flatten_json_column, parse_xml_feed_udf

__all__ = ["read_weekly_csv", "flatten_json_column", "parse_xml_feed_udf"]
