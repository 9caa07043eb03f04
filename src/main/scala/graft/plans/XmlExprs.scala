package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled XML → key/value map extraction.
  *
  * The reference parses a whole XBRL instance document into a Python
  * dict with a UDF and then looks financial keys up case-insensitively
  * (reference: idx_transformation_load_script.py:207-301). Here the
  * parse is ONE compiled Catalyst expression producing a
  * `map<string,string>`; keys are lowercased at map-build time, so
  * every downstream lookup is a plain constant `element_at` — no
  * per-row key transformation, no UDF, one parse regardless of how
  * many fields are extracted.
  */
object XmlExprs {

  /** Parse an XML-ish payload into map<string,string>:
    *  - every LEAF element (text-only content) contributes
    *    `localname -> trimmed text` (namespace prefix stripped),
    *  - every attribute on ANY element contributes
    *    `localname@attrname -> value`.
    * Keys are lowercased; on duplicates the last occurrence wins
    * (dict-assignment semantics, like the reference's parser).
    */
  def xmlLeafMap(payload: Column): Column =
    GraftSqlBridge.column(XmlLeafMapExpr(GraftSqlBridge.expression(payload)))

  /** Case-insensitive lookup against a [[xmlLeafMap]] map: the map
    * keys are already lowercase, so only the (constant) lookup key
    * needs folding — null on absent key (the reference's
    * safe_get_key default), never an ANSI error.
    */
  def getKeyCI(m: Column, key: String): Column =
    org.apache.spark.sql.functions.try_element_at(
      m, org.apache.spark.sql.functions.lit(key.toLowerCase))
}

/** See [[XmlExprs.xmlLeafMap]]. Single-pass regex scan in compiled
  * eval; patterns are compiled once per operator instance, not per
  * row. Malformed payloads degrade to whatever well-formed fragments
  * they contain (extraction, not validation — matches the reference's
  * tolerant parser).
  */
case class XmlLeafMapExpr(child: Expression)
    extends UnaryExpression with UnaryComputeCodegen {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xml_leaf_map expects string, got ${other.simpleString}")
  }

  // <pfx:Tag attr="v" ...> ... </pfx:Tag> with text-only content
  @transient private lazy val leafPat: Pattern = Pattern.compile(
    """<(?:[A-Za-z_][\w.\-]*:)?([A-Za-z_][\w.\-]*)((?:\s+[^<>]*?)?)>([^<]*)</(?:[A-Za-z_][\w.\-]*:)?\1\s*>""")

  // any open tag (for attribute capture on non-leaf elements too)
  @transient private lazy val openPat: Pattern = Pattern.compile(
    """<(?!/)(?:[A-Za-z_][\w.\-]*:)?([A-Za-z_][\w.\-]*)((?:\s+[^<>]*?)?)/?>""")

  @transient private lazy val attrPat: Pattern = Pattern.compile(
    """(?:[A-Za-z_][\w.\-]*:)?([A-Za-z_][\w.\-]*)\s*=\s*"([^"]*)"""")

  /** Public: called from generated code ([[doGenCode]]). */
  def compute(input: UTF8String): MapData = {
    val s = input.toString
    val m = new java.util.LinkedHashMap[String, String]()
    val open = openPat.matcher(s)
    while (open.find()) {
      val tag = open.group(1).toLowerCase
      val attrs = open.group(2)
      if (attrs != null && attrs.nonEmpty) {
        val am = attrPat.matcher(attrs)
        while (am.find()) m.put(tag + "@" + am.group(1).toLowerCase, am.group(2))
      }
    }
    val leaf = leafPat.matcher(s)
    while (leaf.find()) m.put(leaf.group(1).toLowerCase, leaf.group(3).trim)
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = UTF8String.fromString(e.getValue)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): XmlLeafMapExpr =
    copy(child = newChild)

  override def prettyName: String = "xml_leaf_map"
}
