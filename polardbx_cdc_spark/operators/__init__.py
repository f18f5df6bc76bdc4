"""DataFrame→DataFrame operators ported (semantics, not code) from the
reference CDC pipeline. Each module cites the reference file:line it models.
"""
