package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{TensorPack, TensorUnpack}

/** Optimizer rule: eliminate tensor codec roundtrips.
  *
  * `tensor_unpack(tensor_pack(t))` is an identity on valid tensors —
  * pipelines that pack for transport and unpack for compute end up
  * with back-to-back codecs once stages are fused into one plan; this
  * removes the serialize/deserialize pair entirely. (The mirror
  * `pack(unpack(b))` is NOT rewritten: pack normalizes layout, so it
  * is only an identity for well-formed inputs.)
  *
  * Installed by GraftExtensions via injectOptimizerRule — the
  * standard Rule[LogicalPlan] extension point.
  */
object CodecElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // only an identity when the unpack element type matches what
      // pack encoded — unpack(pack(f32-tensor), int32) must still
      // reach the runtime and fail its dtype check
      case TensorUnpack(TensorPack(inner), elem)
          if inner.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
            inner.dataType.asInstanceOf[org.apache.spark.sql.types.StructType](1)
              .dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType == elem =>
        inner
    }
}
