from .predicates import PREDICATE_KINDS, emit_keys  # noqa: F401
from .fingerprint import Fingerprinter, fingerprint_dataset  # noqa: F401
from .corpus import compute_token_df, idf_from_df, common_tokens_from_df  # noqa: F401
