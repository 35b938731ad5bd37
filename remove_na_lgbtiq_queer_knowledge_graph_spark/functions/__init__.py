from .strings import (  # noqa: F401
    clean_string,
    extract_id,
    fingerprint,
    remove_lang,
    strip_markers,
)
from .dates import parse_date_multi, wikibase_time  # noqa: F401
