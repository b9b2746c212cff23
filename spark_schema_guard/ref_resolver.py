"""$ref / $id resolution for schema definitions.

Behavioral parity with the reference's resolver (``fastjsonschema/
ref_resolver.py``): every ``$ref`` is absolutized against the enclosing
``$id`` scope during a driver-side pre-walk, ``$id``-carrying subschemas are
registered in a URI→schema store, JSON-pointer fragments are unescaped per
RFC 6901, plain-name fragments resolve through the store, remote documents
are fetched via per-scheme handlers (or urllib as fallback), and walk depth
is capped as DoS protection.  The implementation is new: the user's schema is
never mutated (we absolutize a deep copy), and resolution is a plain method
call instead of nested context managers.
"""

from __future__ import annotations

import json
import sys
from urllib import parse as urlparse
from urllib.parse import unquote

from .exceptions import SchemaDefinitionError

MAX_WALK_DEPTH = min(500, sys.getrecursionlimit() // 2)


def _json_copy(root):
    """Iterative deep copy of a JSON-like tree (dict/list/scalars).

    The walk absolutizes ``$ref`` values in place, so the user's schema must
    not be mutated; ``copy.deepcopy`` is recursive and would hit Python's
    recursion limit before our own depth cap fires on adversarially deep
    schemas, hence the explicit stack."""
    if not isinstance(root, (dict, list)):
        return root
    top = type(root)()
    stack = [(root, top)]
    while stack:
        src, dst = stack.pop()
        if isinstance(src, dict):
            for key, val in src.items():
                if isinstance(val, dict):
                    child = {}
                    dst[key] = child
                    stack.append((val, child))
                elif isinstance(val, list):
                    child = []
                    dst[key] = child
                    stack.append((val, child))
                else:
                    dst[key] = val
        else:
            for val in src:
                if isinstance(val, dict):
                    child = {}
                    dst.append(child)
                    stack.append((val, child))
                elif isinstance(val, list):
                    child = []
                    dst.append(child)
                    stack.append((val, child))
                else:
                    dst.append(val)
    return top


def schema_id(node: dict) -> str:
    """``$id`` since draft-06, ``id`` in draft-04."""
    return node.get("$id", node.get("id", ""))


def _normalize(uri: str) -> str:
    return urlparse.urlsplit(uri).geturl()


def _pointer_lookup(document, fragment: str):
    """RFC 6901 JSON-pointer evaluation (with %-unquoting)."""
    fragment = fragment.lstrip("/")
    parts = unquote(fragment).split("/") if fragment else []
    node = document
    for raw in parts:
        part = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(part)]
        elif isinstance(node, dict) and part in node:
            node = node[part]
        else:
            raise SchemaDefinitionError("Unresolvable ref: {}".format(part))
    return node


def _fetch_remote(uri: str, handlers: dict):
    scheme = urlparse.urlsplit(uri).scheme
    if scheme in handlers:
        return handlers[scheme](uri)
    from urllib.request import urlopen

    with urlopen(uri) as response:  # driver-side, compile time only
        charset = response.info().get_content_charset() or "utf-8"
        try:
            return json.loads(response.read().decode(charset))
        except ValueError as exc:
            raise SchemaDefinitionError("{} failed to decode".format(uri)) from exc


class SchemaStore:
    """Holds the (deep-copied, ref-absolutized) root schema plus every
    ``$id``-addressable subschema and fetched remote document."""

    def __init__(self, definition, handlers=None):
        self.handlers = handlers or {}
        self.root = _json_copy(definition) if isinstance(definition, dict) else definition
        self.base_uri = schema_id(self.root) if isinstance(self.root, dict) else ""
        self._store: dict[str, object] = {}
        self._walked: set[str] = set()
        self._walk_document(self.base_uri, self.root)

    # -- pre-walk ---------------------------------------------------------

    def _walk_document(self, base_uri: str, document) -> None:
        key = _normalize(base_uri) if base_uri else ""
        if key in self._walked:
            return
        self._walked.add(key)
        self._walk(document, base_uri, 0)

    def _walk(self, node, scope: str, depth: int) -> None:
        if depth >= MAX_WALK_DEPTH:
            raise SchemaDefinitionError(
                "Schema is too deeply nested (maximum depth is {})".format(MAX_WALK_DEPTH)
            )
        if isinstance(node, bool) or not isinstance(node, dict):
            return
        if "$ref" in node and isinstance(node["$ref"], str):
            node["$ref"] = urlparse.urljoin(scope, node["$ref"])
            return
        own_id = schema_id(node)
        if own_id and isinstance(own_id, str):
            scope = urlparse.urljoin(scope, own_id)
            self._store[_normalize(scope)] = node
        for child in node.values():
            if isinstance(child, dict):
                self._walk(child, scope, depth + 1)

    # -- resolution -------------------------------------------------------

    def root_uri(self) -> str:
        return _normalize(self.base_uri)

    def resolve(self, ref: str, current_base: str):
        """Resolve an (already absolutized) ref.

        Returns ``(definition, document_base_uri, canonical_uri)`` — the
        canonical URI keys the compiled-checker cache, enabling recursion.
        """
        target = urlparse.urljoin(current_base or self.base_uri, ref)
        uri, fragment = urlparse.urldefrag(target)
        document_uri = uri or self.base_uri

        norm = _normalize(uri) if uri else ""
        if norm and norm in self._store:
            document = self._store[norm]
        elif not uri or norm == _normalize(self.base_uri):
            document = self.root
        else:
            document = _fetch_remote(uri, self.handlers)
            self._store[norm] = document
            self._walk_document(document_uri, document)

        self._walk_document(document_uri, document)

        if fragment and not fragment.startswith("/"):
            plain = _normalize(urlparse.urljoin(document_uri, "#" + fragment))
            if plain in self._store:
                return self._store[plain], document_uri, plain
            raise SchemaDefinitionError("Unresolvable ref: {}".format(fragment))

        node = _pointer_lookup(document, fragment)
        canonical = _normalize(target)
        return node, document_uri, canonical
