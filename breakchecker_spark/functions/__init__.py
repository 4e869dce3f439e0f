"""Pure scalar functions + their Arrow-vectorized pandas-UDF wrappers.

The pure-Python layer (urlnorm/textnorm/contacts/htmlx) pins exact
semantics and is unit-tested with golden vectors; udfs.py lifts each
function to a vectorized pandas UDF for the Spark hot path.
"""
