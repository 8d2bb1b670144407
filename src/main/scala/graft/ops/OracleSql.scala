package graft.ops

/** Shared DuckDB oracle fragments, so each cross-engine formula lives in
  * exactly one string (a typo fixed in one copied fold but not another
  * would produce an oracle mismatch in only some queries).
  */
private[graft] object OracleSql {

  /** DuckDB mirror of the shared 60-bit md5 prefix (DETERMINISM.md rules
    * 8-10; JVM twin: first 8 md5 bytes unsigned-BE >>> 4): hex-digit fold
    * of the first 15 chars of md5(strExpr), as BIGINT.
    */
  def hex60(strExpr: String): String =
    s"""list_reduce(list_transform(list_transform(range(1, 16),
       |    i -> substr(md5($strExpr), i, 1)),
       |  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)""".stripMargin
}
