class ParseError(Exception):
    """Structured stand-in for the reference's `panic!` sites.

    The reference aborts the process on malformed input (e.g.
    /root/reference/src/lib.rs:66, src/xref.rs:234, src/content.rs:802).
    The engine instead raises ParseError(kind, message); pipeline stages
    catch it and emit an error row (`parse_status="error:<kind>"`).
    """

    def __init__(self, kind: str, message: str = ""):
        self.kind = kind
        self.message = message
        super().__init__(f"{kind}: {message}" if message else kind)
