package graft.jsonata

/** AST for the supported JSONata subset (public language spec:
  * docs.jsonata.org; the reference exposes it via --transform,
  * bin/mqtt-streamr.js:48-51,108,157-159).
  *
  * Supported surface (SURVEY §2.2 "mappable subset" + tier 2):
  *   paths a.b.c, `$` (context), array index a[0] / a[-1], predicates
  *   a[price > 10], wildcard `*` and descendant `**` steps (compiled by
  *   static schema enumeration), arithmetic + - * / %, comparisons
  *   = != < <= > >=, `and` / `or`, string concat `&`, conditional ? :,
  *   object/array constructors, block expressions `(e1; e2; ...)` with
  *   `$x := expr` variable bindings (values and functions), user lambdas,
  *   and the $function library (string/numeric/array/aggregation) that
  *   maps 1:1 onto Spark SQL functions.
  *
  * Not supported (documented degradations, SURVEY §7.4): regex literals
  * raise JsonataParseError at compile time rather than failing at run
  * time. Dynamic object keys are supported with a typed degradation: the
  * constructor compiles to map<string, unified-value-type> instead of a
  * struct (see JsonataCompiler header).
  */
sealed trait JNode

case class JNumber(v: Double) extends JNode
case class JString(v: String) extends JNode
case class JBool(v: Boolean) extends JNode
case object JNull extends JNode
case object JContext extends JNode                          // `$`
case class JPath(steps: List[JStep]) extends JNode          // a.b[0].c[x>1]
case class JBinary(op: String, l: JNode, r: JNode) extends JNode
case class JUnaryMinus(e: JNode) extends JNode
case class JCond(c: JNode, t: JNode, e: JNode) extends JNode
case class JFunc(name: String, args: List[JNode]) extends JNode // $name(...)
case class JLambda(params: List[String], body: JNode) extends JNode // function($x){...}
case class JVarRef(name: String) extends JNode // $x inside a lambda body
case class JObject(fields: List[(JKey, JNode)]) extends JNode
case class JArray(items: List[JNode]) extends JNode
case class JBind(name: String, value: JNode) extends JNode  // $x := expr
case class JBlock(exprs: List[JNode]) extends JNode         // (e1; e2; ...)

/** Object-constructor key: literal (`{a: ...}`, `{"a": ...}`) or a
  * computed expression (`{$k: ...}`, `{name & "_x": ...}`).
  */
sealed trait JKey
case class JKeyLit(name: String) extends JKey
case class JKeyExpr(e: JNode) extends JKey

sealed trait JStep
case class JField(name: String) extends JStep
case class JIndex(i: Int) extends JStep                     // numeric-literal bracket
case class JPredicate(pred: JNode) extends JStep            // boolean bracket
case object JWildcard extends JStep                         // `*` — all child values
case object JDescendant extends JStep                       // `**` — all values at any depth

class JsonataParseError(msg: String) extends RuntimeException(msg)
class JsonataCompileError(msg: String) extends RuntimeException(msg)
