package graft.text

/** Embedded snapshot of the public-suffix list (publicsuffix.org —
  * public data): the multi-label suffixes under which registrations
  * happen one label below, so the REGISTRABLE domain is the suffix
  * plus one label. Single-label TLDs need no entry (the default
  * last-two-labels rule covers them). The snapshot carries the ICANN
  * second-level registrations and private-section hosting suffixes
  * that dominate real crawl rollups; r16 adds the list's WILDCARD
  * rules (`*.ck` — any two-label suffix under the TLD is public, so
  * registration happens at the third label) and EXCEPTION rules
  * (`!www.ck` — carved back out of its wildcard: the host itself IS
  * the registrable domain). The long tail of rare listed entries
  * remains a DECLARED narrowing. Kept as plain string sets so the
  * Spark side (an `isInCollection` over split host labels) and the
  * DuckDB oracle (the same list interpolated into an `IN`) share one
  * source of truth. */
object Psl {

  /** Two-label public suffixes. */
  val suffixes2: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "mil.nz", "kiwi.nz",
    // Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "adv.br", "blog.br", "eng.br", "esp.br", "ind.br", "inf.br", "jus.br",
    "med.br", "tv.br", "vet.br", "wiki.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "bj.cn", "sh.cn", "tj.cn", "cq.cn", "gd.cn",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "edu.in",
    "res.in", "ac.in", "gov.in", "mil.in", "nic.in",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr",
    // Taiwan / Hong Kong / Singapore / Malaysia
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    // Indonesia / Thailand / Vietnam / Philippines
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph", "mil.ph",
    "i.ph",
    // Pakistan / Turkey / Israel / Ukraine
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gob.pk", "gok.pk", "gop.pk", "gos.pk",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "av.tr",
    "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr",
    "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "k12.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Latin America
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "tur.ar", "musica.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "web.ve",
    "co.ve", "info.ve", "e12.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "mil.bo", "int.bo",
    "web.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do", "org.do",
    "sld.do", "web.do", "art.do",
    // Middle East / Africa
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "co.tz", "ac.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
    "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "com.et", "gov.et", "org.et", "edu.et", "net.et", "biz.et", "name.et",
    "info.et",
    // South Asia
    "com.bd", "edu.bd", "ac.bd", "gov.bd", "net.bd", "org.bd", "mil.bd",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk", "ltd.lk",
    "gov.lk", "sch.lk", "net.lk", "int.lk", "grp.lk", "hotel.lk", "ac.lk",
    "com.np", "edu.np", "gov.np", "mil.np", "net.np", "org.np",
    // Europe (ccTLDs with second-level registrations)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
    "mil.pl", "waw.pl", "wroc.pl",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt",
    "publ.pt",
    "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
    "com.hr", "iz.hr", "from.hr", "name.hr",
    "com.ee", "org.ee", "edu.ee", "gov.ee",
    "com.lv", "edu.lv", "gov.lv", "org.lv", "mil.lv", "id.lv", "net.lv",
    "asn.lv", "conf.lv",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "com.iq", "edu.iq", "gov.iq", "mil.iq", "net.iq", "org.iq",
    "com.jo", "org.jo", "net.jo", "edu.jo", "sch.jo", "gov.jo", "mil.jo",
    "name.jo",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa", "org.qa",
    "sch.qa",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "museum.om",
    "net.om", "org.om", "pro.om",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    // North America second-levels
    "ca.us", "ny.us", "tx.us", "fl.us", "dc.us",
    "on.ca", "qc.ca", "bc.ca", "ab.ca", "gc.ca",
    // Private-section hosting suffixes (users' sites are registrable
    // domains one label below these)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "web.app", "firebaseapp.com", "azurewebsites.net", "pages.dev",
    "workers.dev", "neocities.org", "readthedocs.io", "glitch.me",
    "onrender.com", "surge.sh", "now.sh", "fly.dev", "deno.dev",
    "repl.co", "bitbucket.io", "webflow.io", "hashnode.dev",
    "cloudfront.net")

  /** Three-label public suffixes (the private section's per-country
    * hosting entries are the common ones; `s3.amazonaws.com` is the
    * S3-website-bucket rule — three labels, so it lives here where
    * the last-THREE-label probe can actually match it). */
  val suffixes3: Seq[String] = Seq(
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.co.nz", "blogspot.co.za", "blogspot.com.ar",
    "blogspot.com.es", "blogspot.co.il", "s3.amazonaws.com")

  /** TLDs carrying a wildcard rule (`*.<tld>`): EVERY two-label
    * suffix under them is public, so the registrable domain is the
    * last THREE labels — unless an [[exceptions2]] rule carves the
    * host back out. Snapshot of the list's long-standing ICANN
    * wildcards; `bd`/`np` also keep their explicit second-level
    * entries in [[suffixes2]] (same outcome — a listed two-label rule
    * and the wildcard agree on where registration happens). */
  val wildcardTlds: Seq[String] = Seq(
    "bd", "ck", "er", "jm", "kh", "mm", "np", "pg")

  /** Exception rules (`!www.ck`): hosts ending in one of these are
    * registrable AT this suffix (the exception cancels its wildcard,
    * making the entry itself the registrable domain). Checked before
    * every other rule — PSL semantics give exceptions top priority. */
  val exceptions2: Seq[String] = Seq("www.ck")

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => "'" + s + "'").mkString(", ")

  /** The lists as SQL `IN (...)` bodies, for the DuckDB oracle. */
  val sql2: String = sqlList(suffixes2)
  val sql3: String = sqlList(suffixes3)
  val sqlWild: String = sqlList(wildcardTlds)
  val sqlExc: String = sqlList(exceptions2)
}
