from .compliance import AuditLog, ComplianceManager
from .pii import classify_columns, pii_scan

__all__ = ["AuditLog", "ComplianceManager", "classify_columns", "pii_scan"]
