package graft.expr;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to {@code org.apache.spark.sql.classic.ExpressionUtils}: the
 * Column&lt;-&gt;Expression converters are {@code private[sql]} in Scala but
 * public in bytecode, so plain Java can call them. This is the supported
 * classic-backend conversion path (same one Spark's own classic Dataset
 * implementation uses), not an internal hack around semantics.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
