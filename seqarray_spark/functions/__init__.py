"""Column-expression library: the reference's C kernels re-expressed as
Catalyst expressions (JVM-side, whole-stage-codegen friendly)."""
