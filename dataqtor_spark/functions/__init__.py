"""Column-expression function library (checksums, e-mail, phone masks,
text transforms, dates).  Everything here returns pyspark Columns — pure
Catalyst expressions, no Python UDFs — so rules stay inside whole-stage
codegen and are usable in any operator."""
