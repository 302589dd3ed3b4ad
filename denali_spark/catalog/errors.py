"""Catalog error model → HTTP mapping.

Counterpart of /root/reference/common/error.go:8-47 (RestError with
HttpCode()) and routes/router.go:47-72 (mapError). Error payloads follow the
Iceberg REST spec's ErrorModel: {"error": {message, type, code}}.
"""

from __future__ import annotations


class CatalogError(Exception):
    http_code = 500
    error_type = "InternalServerError"

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message

    def payload(self) -> dict:
        return {
            "error": {
                "message": self.message,
                "type": self.error_type,
                "code": self.http_code,
            }
        }


class BadRequest(CatalogError):
    http_code = 400
    error_type = "BadRequestException"


class NoSuchNamespace(CatalogError):
    http_code = 404
    error_type = "NoSuchNamespaceException"


class NoSuchTable(CatalogError):
    http_code = 404
    error_type = "NoSuchTableException"


class NoSuchView(CatalogError):
    http_code = 404
    error_type = "NoSuchViewException"


class NoSuchPlan(CatalogError):
    http_code = 404


class AlreadyExists(CatalogError):
    http_code = 409
    error_type = "AlreadyExistsException"


class NamespaceNotEmpty(CatalogError):
    http_code = 409
    error_type = "NamespaceNotEmptyException"


class CommitConflict(CatalogError):
    """Optimistic-concurrency failure: CAS miss or requirement violation.

    The reference detects CAS misses (routes/tables.go:316-323) but never
    evaluates requirements (routes/tables.go:246-253 — parsed, unused);
    here both paths raise this 409.
    """

    http_code = 409
    error_type = "CommitFailedException"


class UnprocessableEntity(CatalogError):
    """Key present in both removals and updates (routes/ns.go:113-119)."""

    http_code = 422
    error_type = "UnprocessableEntityException"


class NotImplementedInCatalog(CatalogError):
    http_code = 501
    error_type = "NotImplementedException"
