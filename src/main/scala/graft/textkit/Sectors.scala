package graft.textkit

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Ivorian economic-sector classification — the reference's
  * extract_sectors stage (extract_sectors.py:48-345, F21).
  *
  * Scoring, per sector, over the lowercased "title company description
  * location" concatenation:
  *   min(0.3 * keyword_matches, 0.8)
  *   + 0.5 if any company-list entry appears (first hit only)
  *   + 0.2 per keyword appearing in the title (uncapped, as in the
  *     reference — extract_sectors.py:330-334)
  * Best sector by strict >, catalog order wins ties; stored confidence
  * capped at 1.0; SECT_INCONNU when nothing scores.
  *
  * The catalog is static data (a broadcast-style lookup baked into the
  * closure); the classification itself is one UDF call per row, no
  * shuffle.
  */
object Sectors {

  case class SectorInfo(secteur_id: String, secteur_nom: String,
      categorie_parent: String, confidence: Float)

  case class SectorDef(id: String, nom: String, parent: String,
      motsCles: Seq[String], entreprises: Seq[String])

  /** Catalog transcribed from extract_sectors.py:71-302, in order. */
  val catalog: Seq[SectorDef] = Seq(
    SectorDef("SECT_TECH", "Technologies & Informatique", "SERVICES_NUMERIQUES",
      Seq("informatique", "développeur", "développement", "programmeur", "it", "digital",
        "web", "mobile", "application", "logiciel", "data", "analyste", "scientist",
        "intelligence artificielle", "ia", "machine learning", "big data", "cloud",
        "aws", "azure", "google cloud", "devops", "docker", "kubernetes", "cyber",
        "sécurité informatique", "réseau", "système", "base de données", "sql",
        "python", "java", "javascript", "php", "react", "angular", "vue", ".net",
        "c#", "c++", "swift", "kotlin", "scala", "r", "spark", "hadoop", "kafka"),
      Seq("orange", "mtn", "moov", "canal+", "nsia", "ecobank", "sgbci", "baci",
        "uba", "boa", "vsat", "africa systems", "business intelligence")),
    SectorDef("SECT_TELECOM", "Télécommunications", "SERVICES_NUMERIQUES",
      Seq("télécom", "téléphone", "mobile", "réseau", "4g", "5g", "fibre", "internet",
        "opérateur", "gsm", "vsat", "satellite", "communication", "data center",
        "cloud computing", "iot", "objets connectés", "smart city"),
      Seq("orange", "mtn", "moov", "canal+", "africa systems", "côte d'ivoire telecom",
        "ivoire telecom", "telecel", "green", "yoomee", "nsia", "ecobank")),
    SectorDef("SECT_FINANCE", "Banque & Finance", "SERVICES_FINANCIERS",
      Seq("banque", "banquier", "finance", "financier", "comptabilité", "comptable",
        "audit", "auditeur", "contrôleur", "gestion", "budget", "trésorerie",
        "crédit", "prêt", "épargne", "assurance", "assureur", "actuaire",
        "risk management", "compliance", "reglementation", "banque centrale",
        "microfinance", "sfd", "institution financière", "bfc", "bci", "bicici"),
      Seq("nsia", "ecobank", "sgbci", "baci", "boa", "bicici", "bfc", "uba",
        "banque Atlantique", "banque de l'habitat", "biic", "bnii", "bsic",
        "banque centrale", "bceao", "microcred", "fefi", "finadev")),
    SectorDef("SECT_ASSURANCE", "Assurance", "SERVICES_FINANCIERS",
      Seq("assurance", "assureur", "courtier", "risque", "sinistre", "indemnisation",
        "actuaire", "souscription", "réassurance", "mutuelle", "prévoyance",
        "santé", "automobile", "habitation", "responsabilité civile"),
      Seq("nsia assurance", "allianz", "axa", "generali", "atlantic assurance",
        "saar", "sun assurance", "agra", "sicore", "scac", "mutuelle")),
    SectorDef("SECT_AGRO", "Agro-industrie", "INDUSTRIE_AGRICOLE",
      Seq("agriculture", "agricole", "cacao", "café", "anacarde", "hévéa", "coton",
        "palme", "huile", "sucre", "riz", "maïs", "banane", "ananas", "mangue",
        "transformation", "agro-alimentaire", "coopérative", "plantation",
        "irrigation", "semence", "engrais", "pesticide", "export", "filiale"),
      Seq("sifca", "sapc", "cabc", "coris", "bnetd", "palmci", "sucaf",
        "ivoria", "olam", "cargill", "louis dreyfus", "socapalm", "bollore",
        "africa food", "chococam", "sicor", "coopérative", "plantation")),
    SectorDef("SECT_BTP", "BTP & Construction", "INDUSTRIE_CONSTRUCTION",
      Seq("construction", "bâtiment", "travaux publics", "tp", "btp", "architecte",
        "ingénieur", "chantier", "maçon", "électricien", "plombier", "peintre",
        "ciment", "béton", "acier", "infrastructure", "route", "pont", "tunnel",
        "immeuble", "résidentiel", "commercial", "projet", "urbanisme"),
      Seq("bollore", "bouygues", "vinci", "eiffage", "razel", "somagec", "setraci",
        "poti", "scetia", "sogea", "dumez", "citra", "sogea-satamur", "icf",
        "cimaf", "ciments de la côte", "unibéton", "béton cellulaire")),
    SectorDef("SECT_COMMERCE", "Commerce & Distribution", "SERVICES_COMMERCIAUX",
      Seq("commerce", "vente", "commercial", "distribution", "import", "export",
        "grossiste", "détaillant", "magasin", "boutique", "supermarché", "hypermarché",
        "franchise", "représentant", "agent commercial", "business development",
        "marketing", "promotion", "client", "relation client", "crm"),
      Seq("bollore", "cfa", "carrefour", "supermarché", "pharmacie", "jumia",
        "kilimall", "yango market", "capri cavanni", "tcb", "société générale",
        "shell", "total", "ivoire énergie", "distribution", "import-export")),
    SectorDef("SECT_SANTE", "Santé & Pharmacie", "SERVICES_SANTE",
      Seq("médecin", "docteur", "infirmier", "pharmacien", "chirurgien", "hospitalier",
        "clinique", "hôpital", "cabinet", "laboratoire", "analyse", "radiologie",
        "pharmacie", "médicament", "soins", "santé publique", "épidémiologie",
        "vaccination", "maladie", "traitement", "diagnostic", "urgence"),
      Seq("pharmacie", "clinique", "hôpital", "polyclinique", "laboratoire",
        "bioanalyse", "radiologie", "pharmacie populaire", "sanofi", "pfizer",
        "gsk", "novartis", "msd", "roche", "bms", "jnj", "abbott")),
    SectorDef("SECT_EDUCATION", "Éducation & Formation", "SERVICES_EDUCATION",
      Seq("enseignant", "professeur", "éducation", "école", "université", "formation",
        "pédagogie", "didactique", "apprentissage", "stage", "alternance",
        "enseignement supérieur", "secondaire", "primaire", "maternelle",
        "langue", "mathématiques", "sciences", "lettres", "histoire", "géographie"),
      Seq("université", "inphb", "esp", "ens", "institut", "école", "lycée",
        "collège", "maternelle", "centre de formation", "orange digital center",
        "microsoft innovation center", "google", "ibm", "cfa", "afdb")),
    SectorDef("SECT_ADMIN", "Administration Publique", "SERVICES_PUBLICS",
      Seq("administration", "fonction publique", "ministère", "secrétariat", "d'état",
        "préfet", "sous-préfet", "mairie", "commune", "collectivité", "territoriale",
        "service public", "état", "gouvernement", "ambassade", "consulat",
        "police", "gendarmerie", "armée", "défense", "justice", "tribunal"),
      Seq("état", "gouvernement", "présidence", "primature", "ministère", "dgi",
        "dgf", "douane", "police", "gendarmerie", "armée", "justice", "tribunal",
        "cour", "ambassade", "consulat", "onu", "pnud", "fao", "afdb")),
    SectorDef("SECT_HOTELLERIE", "Hôtellerie & Tourisme", "SERVICES_TOURISTIQUES",
      Seq("hôtel", "hôtelier", "restaurant", "tourisme", "touriste", "guide",
        "agence de voyage", "réceptif", "loisir", "événement", "congrès",
        "séminaire", "mariage", "cérémonie", "traiteur", "cuisine", "chef"),
      Seq("novotel", "ibis", "radisson", "azalai", "tropico", "sofitel", "hilton",
        "marriott", "accor", "restaurant", "agence de voyage", "discovery",
        "visit côte d'ivoire", "office du tourisme", "congress center")),
    SectorDef("SECT_TRANSPORT", "Transport & Logistique", "SERVICES_TRANSPORT",
      Seq("transport", "logistique", "livreur", "chauffeur", "camion", "véhicule",
        "aéroport", "avion", "pilote", "steward", "cargo", "port", "dock",
        "transit", "supply chain", "entreposage", "warehouse", "distribution"),
      Seq("bollore", "sdv", "maersk", "cma cgm", "air côte d'ivoire", "air france",
        "ethiopian", "turkish airlines", "brussels airlines", "port autonome",
        "sag", "setrag", "utc", "société de transport", "dhl", "ups", "fedex")),
    SectorDef("SECT_ENERGIE", "Énergie & Mines", "INDUSTRIE_ENERGIE",
      Seq("énergie", "electricité", "cie", "hydrocarbure", "pétrole", "gaz",
        "mine", "exploitation", "géologue", "forage", "sismique", "pipeline",
        "raffinerie", "distribution", "éolien", "solaire", "renouvelable"),
      Seq("cie", "petroci", "total", "shell", "esso", "ivoire énergie", "aip",
        "geoci", "sodemi", "société minière", "endiama", "china minmetals")),
    SectorDef("SECT_MANUFACTURE", "Industrie Manufacturière", "INDUSTRIE_MANUFACTURE",
      Seq("industrie", "manufacture", "usine", "production", "qualité", "process",
        "maintenance", "ingénieur", "technicien", "opérateur", "ligne production",
        "emballage", "conditionnement", "supply chain", "lean", "six sigma"),
      Seq("bollore", "sifca", "unilever", "nestle", "p&g", "coca cola", "pepsi",
        "sabc", "palmci", "cimaf", "béton cellulaire", "plastic industry")))

  val unknown: SectorInfo = SectorInfo("SECT_INCONNU", "Secteur inconnu", "INCONNU", 0.0f)

  /** F21 core, one row. */
  def classify(title: String, company: String, description: String,
      location: String): SectorInfo = {
    val present = Seq(title, company, description).exists(s => s != null && s.nonEmpty)
    if (!present) return unknown
    val fullLo = Seq(title, company, description, location)
      .filter(s => s != null && s.nonEmpty).mkString(" ").toLowerCase
    val titleLo = Option(title).getOrElse("").toLowerCase

    var best = unknown
    for (s <- catalog) {
      val kwMatches = s.motsCles.count(fullLo.contains)
      var conf = if (kwMatches > 0) math.min(kwMatches * 0.3, 0.8) else 0.0
      if (s.entreprises.exists(e => fullLo.contains(e.toLowerCase))) conf += 0.5
      conf += 0.2 * s.motsCles.count(titleLo.contains)
      if (conf > best.confidence) {
        best = SectorInfo(s.id, s.nom, s.parent, math.min(conf, 1.0).toFloat)
      }
    }
    best
  }

  val classifyUdf: UserDefinedFunction =
    udf((t: String, c: String, d: String, l: String) => classify(t, c, d, l))
}
