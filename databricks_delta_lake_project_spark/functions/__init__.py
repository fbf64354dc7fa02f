from .cleaning import (
    clean_email,
    clean_phone,
    full_name,
    standardize_strings,
    validate_domain,
)
from .masking import is_group_member, mask_email, mask_phone, secured_view
from .scoring import age_bucket, engagement_score, health_score

__all__ = [
    "clean_email",
    "clean_phone",
    "full_name",
    "standardize_strings",
    "validate_domain",
    "is_group_member",
    "mask_email",
    "mask_phone",
    "secured_view",
    "age_bucket",
    "engagement_score",
    "health_score",
]
