"""PG-name function layer (SURVEY.md §2.7).

Most of the reference's scalar surface exists in Spark SQL under the same
name (nvl, nvl2, decode, coalesce, greatest, least, split_part, translate,
md5, ...). This package registers the remainder as SQL-callable functions
so `engine.sql()` accepts PG-flavored queries.
"""

from .pg_compat import register_pg_functions  # noqa: F401
