package graft.core

/** grblas-parity exception hierarchy.
  *
  * The reference's test harness asserts IDENTICAL error behavior vs
  * grblas (`tests/utils.py:51-52` compares `str(exc)` of both engines),
  * and its suites catch errors both by class
  * (`tests/from_grblas/test_matrix.py:84` IndexOutOfBound,
  * `:137` OutputNotEmpty, `:408` DimensionMismatch) and by message
  * substring (`test_matrix.py:81` "Duplicate indices found", `:289`
  * "require_monoid", `test_vector.py:73` "No indices provided. Unable
  * to infer size"). A user porting grblas code that catches
  * `gb.exceptions.X` maps it to `graft.core.X` by name; code matching
  * message substrings keeps working verbatim.
  *
  * All extend IllegalArgumentException — the Scala analogue of the
  * ValueError/TypeError the python layer raises — so generic handlers
  * (and this repo's earlier tests) remain valid.
  */
class GraphblasException(msg: String) extends IllegalArgumentException(msg)

/** `gb.exceptions.OutputNotEmpty` — build into a non-empty collection
  * (reference vector.py:452, matrix.py:507)
  */
final class OutputNotEmpty(msg: String) extends GraphblasException(msg)

/** `gb.exceptions.IndexOutOfBound` — an index at/past the dimension
  * (reference vector.py:464-468, matrix.py:522-533)
  */
final class IndexOutOfBound(msg: String) extends GraphblasException(msg)

/** `gb.exceptions.DimensionMismatch` — operand shapes incompatible
  * (reference expr.py:1565-1669)
  */
final class DimensionMismatch(msg: String) extends GraphblasException(msg)

object GraphblasException {
  def outputNotEmpty(what: String): Nothing =
    throw new OutputNotEmpty(s"OutputNotEmpty: build requires an empty $what")
  def indexOutOfBound(detail: String): Nothing =
    throw new IndexOutOfBound(s"IndexOutOfBound: $detail")
  def dimensionMismatch(detail: String): Nothing =
    throw new DimensionMismatch(s"DimensionMismatch: $detail")
}
