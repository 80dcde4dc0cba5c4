from .parser import classify, parse_document, parse_transcripts, resolve_payload

__all__ = ["classify", "parse_document", "parse_transcripts", "resolve_payload"]
